"""Same-session A/B for dedup_minhash_lsh (VERDICT r3 ask #4).

Cross-round bench numbers for this query drifted (r1 1.315 s → r3
1.650 s min-of-4 at sf0.1) while the regenerated physical plans stayed
byte-identical — pointing at host noise + regenerated testdata, not a
plan regression. Cross-round comparisons on this virtualized host are
unreliable (multi-second CPU-steal bursts, driver-regenerated parquet
between rounds), so this tool does the only comparison that holds:
both variants materialized in ONE JVM, interleaved, min-of-N.

Variants:
  current — minhash_near_dups as shipped: slim pair-list broadcast,
            array sides through one shuffled-hash join.
  r1_fat  — the r1-era verify join: BROADCAST the candidate docs WITH
            their shingle arrays (fastest locally, rejected in r2
            because a fat-array broadcast is a driver/executor OOM at
            100 TB — see TUNING.md and
            test_minhash_verify_never_broadcasts_arrays).

Usage: python tools/ab_minhash.py [sf_dir] [n_passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from mapreduce_itwiki_spark.operators import dedup  # noqa: E402
from mapreduce_itwiki_spark.session import get_spark  # noqa: E402
from mapreduce_itwiki_spark.sources.parquet import load_table  # noqa: E402


def r1_fat_verify(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """The r1-era shape: candidates as today, but verification joins the
    full corpus shingle frame against a BROADCAST of candidate docs
    carrying their shingle arrays."""
    cands = dedup.minhash_candidate_pairs(docs)
    sets = dedup._fanout(docs.select("doc_id", "text"), "doc_id").select(
        F.col("doc_id"), dedup.shingles(F.col("text")).alias("sh")
    )
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .union(cands.select(F.col("doc_b")))
        .distinct()
    )
    cand_sets = sets.join(cand_docs, "doc_id")  # slim docs → small frame
    a = cand_sets.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
    )
    b = cand_sets.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
    )
    j = (
        cands.join(F.broadcast(a), "doc_a")
        .join(F.broadcast(b), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab_minhash")
    docs = load_table(spark, sf_dir, "documents")
    variants = {
        "current": lambda: dedup.minhash_near_dups(docs, threshold=0.5),
        "r1_fat": lambda: r1_fat_verify(docs, threshold=0.5),
    }
    samples: dict[str, list[float]] = {k: [] for k in variants}
    for name, build in variants.items():  # untimed warm-up pass
        build().write.mode("overwrite").format("noop").save()
    for _ in range(n_passes):
        for name, build in variants.items():
            t0 = time.perf_counter()
            build().write.mode("overwrite").format("noop").save()
            samples[name].append(time.perf_counter() - t0)
    for name, s in samples.items():
        s = sorted(s)
        print(
            f"{name}: min={s[0]:.3f} med={s[len(s) // 2]:.3f} "
            f"all={[round(x, 3) for x in s]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
