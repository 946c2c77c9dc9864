"""Stage-level profile of dedup_minhash_lsh at scale (TUNING.md round 4).

The sf5 soak measured 402 s end-to-end and showed the 2048-doc bucket
cap changed nothing — so the cost is NOT one pathological bucket. This
breaks the pipeline into its stages and records wall time + cardinality
for each, so the fix targets the stage that actually burns the time:

  1. signatures        — md5/shingle + 16 universal hashes + groupBy min
  2. band rows          — explode to (doc_id, band_id, band_key)
  3. bucket histogram   — size distribution of band buckets (the
                          Σ bucket² driver of candidate cost)
  4. candidate pairs    — band self-join + distinct
  5. verify             — exact shingle-Jaccard join for candidates

Usage: python tools/profile_minhash.py SF_DIR OUT_JSON
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_itwiki_spark.operators import dedup  # noqa: E402
from mapreduce_itwiki_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    out_json = sys.argv[2]
    spark = get_spark("profile_minhash")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out: dict = {"sf_dir": sf_dir, "n_docs": docs.count()}

    t0 = time.perf_counter()
    sigs = dedup.minhash_signatures(docs).localCheckpoint()
    out["signatures_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    bands = dedup._minhash_bands(sigs).localCheckpoint()
    out["band_rows"] = bands.count()
    out["bands_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    hist = (
        bands.groupBy("band_id", "band_key")
        .count()
        .select(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("count").alias("max_bucket"),
            F.expr("percentile_approx(count, array(0.5, 0.9, 0.99))").alias("p"),
            F.sum(F.col("count") * F.col("count")).alias("sum_sq"),
            F.sum(
                F.when(
                    F.col("count") <= dedup.MINHASH_MAX_BUCKET,
                    F.col("count") * (F.col("count") - 1) / 2,
                ).otherwise(F.lit(0))
            ).alias("uncapped_pairs_upper"),
        )
        .collect()[0]
    )
    out.update(
        n_buckets=hist["n_buckets"],
        max_bucket=hist["max_bucket"],
        bucket_p50_p90_p99=[float(x) for x in hist["p"]],
        sum_bucket_sq=int(hist["sum_sq"]),
        uncapped_pairs_upper=int(hist["uncapped_pairs_upper"]),
    )
    out["histogram_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    cands = dedup.minhash_candidate_pairs(docs).localCheckpoint()
    out["n_candidates"] = cands.count()
    out["candidates_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    verified = dedup.pair_jaccard(docs, cands).filter(F.col("jaccard") >= 0.5)
    out["n_near_dups"] = verified.count()
    out["verify_sec"] = round(time.perf_counter() - t0, 2)

    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
