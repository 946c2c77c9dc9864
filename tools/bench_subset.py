"""Iteration helper for optimization rounds: time a SUBSET of the bench
headline queries with the same methodology as bench.py (noop sink,
warm-up passes, min/median over timed passes) without paying for the
whole 67-row suite.

Usage:
    python tools/bench_subset.py q1_pricing_summary ann_ivfpq_index_build
    SPARK_GRAFT_PASSES=2 SPARK_GRAFT_WARMUPS=1 python tools/bench_subset.py ...

Prints one JSON line per query: {"name": ..., "min": s, "med": s, "all": [...]}.
Not part of the driver contract — bench.py stays the recorded artifact.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_itwiki_spark.plans import catalog  # noqa: E402
from mapreduce_itwiki_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warmups = int(os.environ.get("SPARK_GRAFT_WARMUPS", "2"))
    passes = int(os.environ.get("SPARK_GRAFT_PASSES", "4"))
    spark = get_spark("bench-subset")
    qs = catalog.queries()
    for name in names:
        if name not in qs:
            print(json.dumps({"name": name, "error": "unknown query"}))
            continue
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        for _ in range(warmups):
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        samples: list[float] = []
        for i in range(passes):
            spark.sparkContext.setJobDescription(f"timed[{i}]: {name}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
        s = sorted(samples)
        print(
            json.dumps(
                {
                    "name": name,
                    "min": round(s[0], 3),
                    "med": round(s[len(s) // 2], 3),
                    "all": [round(x, 3) for x in samples],
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
