"""Same-JVM spread probe for knn_graph_lsh (VERDICT r4 ask #6).

r4's BENCH_sf5.json recorded [24.6, 37.8, 154.5] for knn_graph_lsh at
sf5 — a 6× spread across separate JVMs on a noisy shared host. This
tool answers the only question that matters: is the spread a straggler
bucket (a pandas group can't be AQE-split, so one hot bucket serializes
a wave) or host noise? It runs N back-to-back passes in ONE JVM and,
per pass, also records the per-bucket candidate-row histogram the
kernel actually sees (bucket sizes are deterministic — data-dependent,
not run-dependent — so a straggler would show up as a consistently
slow pass, not a random one).

Usage: python tools/probe_knn_spread.py SF_DIR [N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_itwiki_spark.operators import similarity  # noqa: E402
from mapreduce_itwiki_spark.session import get_spark  # noqa: E402
from mapreduce_itwiki_spark.sources.parquet import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("probe_knn_spread")
    emb = load_table(spark, sf_dir, "embeddings")

    # deterministic bucket-size histogram: how unbalanced is the
    # applyInPandas group layout the kernel must chew through?
    sizes = (
        similarity.sharded_band_rows(emb)
        .groupBy("band_id", "band_key", "shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("n").alias("max"),
            F.expr("percentile(n, 0.5)").alias("p50"),
            F.expr("percentile(n, 0.99)").alias("p99"),
            F.sum(F.col("n") * F.col("n")).alias("sum_sq"),
        )
        .collect()[0]
        .asDict()
    )
    times = []
    for i in range(n):
        t0 = time.perf_counter()
        similarity.knn_graph(emb, k=3).write.mode("overwrite").format(
            "noop"
        ).save()
        times.append(round(time.perf_counter() - t0, 2))
        print(f"pass {i + 1}/{n}: {times[-1]} s (load avg {os.getloadavg()})",
              flush=True)
    out = {"sf_dir": sf_dir, "times": times, "min": min(times),
           "max": max(times), "spread": round(max(times) / min(times), 2),
           "bucket_sizes": {k: float(v) for k, v in sizes.items()}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
