"""Range join via time-bucketing (SURVEY.md §2 'custom operators' —
Spark has no native range/interval join; the naive form is a cartesian
product with a θ-filter).

Bucketize the range key to width = the window, then equi-join on
(partition key, bucket) for the three bucket offsets {-1, 0, +1} and
apply the exact θ-filter. Any pair within `window` spans at most one
bucket boundary, so bucket ∈ {b-1, b, b+1} covers every qualifying pair
— the bucketed join provably equals the cartesian θ-join while costing
Σ bucket² instead of n². This is the same completeness-by-construction
trick as the SimHash banding (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join_pandas(events: DataFrame) -> DataFrame:
    """AS-OF join via per-group ``pd.merge_asof`` (the applyInPandas
    alternative to the windowed-conditional-max form in
    plans/relational.py:asof_join_last_click — same semantics, tested
    equal). Use this shape when the as-of logic outgrows window
    expressions (nearest-within-tolerance, backward+forward, multiple
    quote columns); the window form when it doesn't. One shuffle on the
    partition key either way."""
    import pandas as pd

    base = events.select(
        F.col("user_id"),
        F.col("event_id"),
        F.col("event_type"),
        F.unix_micros(F.col("ts")).alias("us"),
    )

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["us", "event_id"]).reset_index(drop=True)
        # strictly-prior latest click per row: shift click timestamps fwd
        click_us = pdf["us"].where(pdf["event_type"] == "click")
        prior_click = click_us.shift(1).ffill()
        out = pdf[pdf["event_type"] == "purchase"].copy()
        out["click_us"] = prior_click[out.index]
        return out[["event_id", "user_id", "us", "click_us"]]

    res = base.groupBy("user_id").applyInPandas(
        per_user, "event_id long, user_id long, us long, click_us double"
    )
    return res.select(
        "event_id",
        "user_id",
        F.col("us").alias("purchase_us"),
        F.col("click_us").cast("long").alias("last_click_us"),
    )


def events_within_window(events: DataFrame, window_sec: int = 300) -> DataFrame:
    """All ordered pairs of SAME-USER events ≤ window_sec apart:
    (user_id, event_a, event_b, delta_sec) with event_a's timestamp ≤
    event_b's (ties broken by event_id).

    One shuffle per side on (user_id, bucket); AQE skew-splits hot
    (user, bucket) cells. The 3-offset union is an explode, not three
    scans."""
    w_us = window_sec * 1_000_000
    base = events.select(
        F.col("user_id"),
        F.col("event_id"),
        F.unix_micros(F.col("ts")).alias("us"),
        (F.unix_micros(F.col("ts")) / F.lit(w_us)).cast("long").alias("bucket"),
    )
    # left side probes its own bucket and both neighbors
    probe = base.select(
        "user_id",
        "event_id",
        "us",
        F.explode(
            F.array(F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1)
        ).alias("bucket"),
    )
    build = base
    a, b = probe.alias("a"), build.alias("b")
    joined = a.join(b, ["user_id", "bucket"]).filter(
        # strict (us, event_id) order => each unordered pair exactly once,
        # and a self-pair never qualifies
        (F.col("a.us") < F.col("b.us"))
        | ((F.col("a.us") == F.col("b.us")) & (F.col("a.event_id") < F.col("b.event_id")))
    )
    # no dedup needed: the build side carries only its own bucket, so a
    # pair matches in exactly one (user, bucket) cell
    return joined.filter((F.col("b.us") - F.col("a.us")) <= w_us).select(
        F.col("user_id"),
        F.col("a.event_id").alias("event_a"),
        F.col("b.event_id").alias("event_b"),
        ((F.col("b.us") - F.col("a.us")) / F.lit(1_000_000.0)).alias("delta_sec"),
    )