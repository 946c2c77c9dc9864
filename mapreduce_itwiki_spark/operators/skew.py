"""Skew-resilient aggregation patterns (SURVEY.md §7 M5).

The reference's signature shape — dedup then count-per-key — is
skew-prone at scale: popular pages are hot ``page_to`` keys. Spark's
algebraic aggregates already partial-combine map-side, and AQE splits
skewed shuffle partitions; this module covers the remaining case —
NON-algebraic aggregates (collect_set/exact distinct lists) over hot
keys — with the classic two-phase salt:

    phase 1: groupBy(key, salt)  — hot key spread over S partitions
    phase 2: groupBy(key)        — merge the S partials

Salting is exactness-preserving for any aggregate with an associative
merge; here we expose the distinct-count shape used by the link graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_distinct_count(
    df: DataFrame, key: str, value: str, n_salts: int = 16, out: str = "n_distinct"
) -> DataFrame:
    """COUNT(DISTINCT value) GROUP BY key, salt-spread for hot keys.

    Phase 1 dedups (key, value) within (key, salt) buckets — the salt is
    a hash of the VALUE, so one (key, value) pair lands in exactly one
    bucket and cross-bucket distinct sets are disjoint; phase 2 sums the
    disjoint partial distinct-counts. Equivalent to the unsalted
    ``dropDuplicates + count`` for any data, but the phase-1 shuffle key
    (key, salt) caps any single reducer at 1/n_salts of a hot key."""
    salt = F.pmod(F.hash(F.col(value)), F.lit(n_salts)).alias("_salt")
    phase1 = (
        df.select(F.col(key), F.col(value), salt)
        .dropDuplicates([key, value, "_salt"])  # (key,value) unique per bucket
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return phase1.groupBy(key).agg(F.sum("_partial").cast("long").alias(out))
