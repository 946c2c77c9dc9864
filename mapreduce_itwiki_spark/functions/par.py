"""Concurrent driver-side actions (optimization r10, guide §2.6).

Spark happily runs several jobs at once inside one application; actions
are only sequential because driver code calls them sequentially. The
persisted-index writers issue several INDEPENDENT actions back to back
(sidecar writes, the main table write) — on an otherwise idle local[32]
each of those small jobs leaves the cluster mostly idle, and at scale
the next job's tasks back-fill the tail of the previous one. This
helper overlaps them from a small thread pool and re-raises the first
failure. Completion-marker sidecars (``_meta``/``_geometry``, written
LAST by contract) stay OUTSIDE the pool at their call sites.
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor


def fanout(df, *cols: str):
    """Gated repartition before CPU-heavy per-row compute (the
    ``dedup._fanout`` idiom, shared): when the upstream source arrives
    as fewer splits than ``defaultParallelism`` — the normal state of a
    few-MB local parquet scan, where hashing would otherwise run on ONE
    task — repartition to the session parallelism; when the input is
    already split at least that wide (a real at-scale scan), the
    exchange is pure cost and is skipped."""
    from pyspark.sql import functions as F

    n = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *[F.col(c) for c in cols])


def run_concurrent(*thunks: Callable[[], object]) -> list[object]:
    """Run the given zero-arg actions concurrently; return their
    results in order; raise the first exception (after all complete or
    fail). 2-4 jobs in flight is the sweet spot (guide §2.6)."""
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]
