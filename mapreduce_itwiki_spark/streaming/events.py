"""Structured Streaming over the events table.

The reference is pure batch (SURVEY.md §2 'Streaming — none'); this is
north-star surface. The same hourly rollup as the batch
``time_bucket_hourly`` query, run as a streaming windowed aggregation —
``readStream`` over the parquet directory, event-time window, memory
sink drained synchronously with ``processAllAvailable`` so the catalog
query is deterministic and oracle-checkable against the batch SQL.

Scale notes: in production the source is Kafka/files-on-arrival; the
watermark bounds state for append sinks. Here the finite file feed +
complete output mode gives the exact batch answer, which is the point
of the oracle pairing.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.par import salted_by_partition
from ..plans.catalog import register

_counter = itertools.count()


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet, with the SAME timestamp
    normalization as ``sources/parquet.py:load_table`` — both confs set
    at RUNTIME because the driver invokes catalog queries on a vanilla
    session (builder-level conf never reaches it): TIMESTAMP(NANOS)
    reads as nano-longs (legacy conf) rebuilt via ``timestamp_micros``,
    and NTZ inference is disabled so naive-micros timestamps read as
    epoch-UTC TIMESTAMP — the type watermarks and ``unix_micros``
    require (TIMESTAMP_NTZ is rejected by both)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def hourly_event_rollup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hourly (window × event_type) counts + value sums."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    name = f"stream_hourly_{next(_counter)}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"),
        "event_type",
        "n",
        "total_value",
    )


register(
    "streaming_hourly_rollup",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
           event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)(hourly_event_rollup_stream)


def sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STATEFUL streaming operator: per-user session counting with
    a 30-minute inactivity gap, via applyInPandasWithState (the
    Spark-idiomatic slot for operators the built-in windowed aggs can't
    express — the reference has no streaming at all, SURVEY.md §2).

    State carries (n_events, n_sessions, last_us) across micro-batches so
    a long-running feed keeps exact session counts; with the finite file
    feed here every user closes in one batch and the result equals the
    batch sessionize query — which is what the oracle checks."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = _events_stream(spark, sf_dir)
    # _events_stream already normalized ts to TIMESTAMP whatever the
    # parquet physical type, so epoch micros is one expression
    stream = stream.withColumn("us", F.unix_micros(F.col("ts")))

    gap_us = 1_800_000_000

    def track(key, pdf_iter, state: GroupState):
        n_events, n_sessions, last_us = (
            state.get if state.exists else (0, 0, None)
        )
        stamps = []
        for pdf in pdf_iter:
            stamps.extend(pdf.sort_values(["us", "event_id"])["us"].tolist())
        stamps.sort()
        for us in stamps:
            if last_us is None or us - last_us > gap_us:
                n_sessions += 1
            last_us = us
            n_events += 1
        state.update((n_events, n_sessions, last_us))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n_events], "n_sessions": [n_sessions]}
        )

    out = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            track,
            outputStructType="user_id long, n_events long, n_sessions long",
            stateStructType="n_events long, n_sessions long, last_us long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = f"stream_sessions_{next(_counter)}"
    q = out.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update-mode memory sink may hold one row per state update; keep the
    # final state per user
    latest = spark.table(name)
    return (
        latest.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("n_sessions").alias("n_sessions"),
        )
    )


def enrich_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC join: the event stream enriched against a batch
    dimension (customer), then aggregated per market segment — the
    canonical streaming-ETL shape (dimension broadcast into every
    micro-batch; no state, no watermark needed for inner stream-static
    joins). Finite feed ⇒ equals the batch join, which the oracle
    checks."""
    stream = _events_stream(spark, sf_dir)
    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    joined = stream.join(F.broadcast(dim), stream.user_id == dim.c_custkey)
    agg = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value")
    )
    name = f"stream_enrich_{next(_counter)}"
    q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


register(
    "streaming_enrich_join",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_events, round(sum(e.value), 2) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)(enrich_join_stream)


def _clicks_purchases(stream: DataFrame):
    """The shared two-sided attribution setup of all four stream-stream
    join queries (inner / leftOuter / fullOuter / leftSemi): click and
    purchase substreams with 1-hour watermarks, plus the join condition
    (same user, purchase within 30 minutes after the click). One
    definition so the window/watermark can never desynchronize across
    the four variants and their oracles."""
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", "1 hour")
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 minutes"))
    )
    return clicks, purchases, cond


def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM inner join with dual watermarks and an event-time
    range condition — click→purchase attribution (a purchase matches
    every click by the same user in the preceding 30 minutes). This is
    the one join shape the other streaming entries don't cover: BOTH
    sides are unbounded, so Spark buffers each side in state keyed by
    user and the time-range predicate plus the two watermarks bound how
    long a click is held (state eviction, the thing that makes the join
    runnable forever at 100 TB/day). Inner-join matches emit as soon as
    both sides arrive — the finite feed drained with
    processAllAvailable therefore yields exactly the batch range-join
    answer, which the oracle replays."""
    stream = _events_stream(spark, sf_dir)
    clicks, purchases, cond = _clicks_purchases(stream)
    joined = clicks.join(
        purchases,
        cond,
    )
    name = f"stream_ss_join_{next(_counter)}"
    q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.col("c_user").alias("user_id"),
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_at"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_at"),
    )


register(
    "streaming_stream_stream_join",
    oracle="""
    SELECT c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_at,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_at
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)(stream_stream_join)


def stream_stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join — the attribution query that also
    reports clicks that never converted. Outer results are what make
    this a genuinely different operator from the inner form: a
    null-extended row for a click may only emit once the join state
    KNOWS no purchase can still arrive — i.e. when the click's entire
    30-minute match window has passed the watermark and its state is
    evicted (Spark emits these in the no-data micro-batch that follows
    the feed). Clicks whose window is still open when the feed drains
    stay buffered and produce NO row — so this is NOT the batch left
    join, and the oracle replays the eviction rule explicitly: matches,
    plus null rows only for unmatched clicks with
    click_ts + 30 min < the final JOINT watermark. Each watermark
    operator sits after its event-type filter, so it advances off that
    side's own max event time, and the joint watermark is the MIN
    across operators: least(max click_ts, max purchase_ts) − 1 h —
    verified empirically (using max over ALL events over-emits one null
    row for the final click at sf0.001)."""
    stream = _events_stream(spark, sf_dir)
    clicks, purchases, cond = _clicks_purchases(stream)
    joined = clicks.join(
        purchases,
        cond,
        "leftOuter",
    )
    name = f"stream_ss_louter_{next(_counter)}"
    q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.col("c_user").alias("user_id"),
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_at"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_at"),
    )


register(
    "streaming_stream_stream_left_outer",
    oracle="""
    WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    wm AS (SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
                    - INTERVAL 1 HOUR AS w),
    m AS (
      SELECT c.user_id, c.ts AS click_ts, p.ts AS purchase_ts
      FROM c JOIN p ON c.user_id = p.user_id
       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE),
    u AS (
      SELECT c.user_id, c.ts AS click_ts
      FROM c
      WHERE NOT EXISTS (
              SELECT 1 FROM p
              WHERE p.user_id = c.user_id
                AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE)
        AND c.ts + INTERVAL 30 MINUTE < (SELECT w FROM wm))
    SELECT user_id,
           strftime(click_ts, '%Y-%m-%d %H:%M:%S') AS click_at,
           strftime(purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_at
    FROM m
    UNION ALL
    SELECT user_id, strftime(click_ts, '%Y-%m-%d %H:%M:%S'), NULL FROM u
    """,
)(stream_stream_left_outer_join)


def stream_stream_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER join — both unmatched sides surface,
    each under its OWN eviction rule (the asymmetry is the point): an
    unconverted click emits null once its entire 30-minute match window
    passes the joint watermark (click_ts + 30 min < wm, as in the
    left-outer form), but an orphan purchase only needs the watermark
    to pass its own timestamp (purchase_ts < wm) — every click that
    could still match it (click_ts ∈ [purchase_ts − 30 min,
    purchase_ts]) has then provably arrived. The oracle replays both
    rules against the min-of-sides final watermark."""
    stream = _events_stream(spark, sf_dir)
    clicks, purchases, cond = _clicks_purchases(stream)
    joined = clicks.join(
        purchases,
        cond,
        "fullOuter",
    )
    name = f"stream_ss_fouter_{next(_counter)}"
    q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_at"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_at"),
    )


register(
    "streaming_stream_stream_full_outer",
    oracle="""
    WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    wm AS (SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
                    - INTERVAL 1 HOUR AS w),
    m AS (
      SELECT c.user_id, c.ts AS click_ts, p.ts AS purchase_ts
      FROM c JOIN p ON c.user_id = p.user_id
       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE),
    uc AS (
      SELECT c.user_id, c.ts AS click_ts
      FROM c
      WHERE NOT EXISTS (
              SELECT 1 FROM p
              WHERE p.user_id = c.user_id
                AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE)
        AND c.ts + INTERVAL 30 MINUTE < (SELECT w FROM wm)),
    up AS (
      SELECT p.user_id, p.ts AS purchase_ts
      FROM p
      WHERE NOT EXISTS (
              SELECT 1 FROM c
              WHERE c.user_id = p.user_id
                AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE)
        AND p.ts < (SELECT w FROM wm))
    SELECT user_id,
           strftime(click_ts, '%Y-%m-%d %H:%M:%S') AS click_at,
           strftime(purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_at
    FROM m
    UNION ALL
    SELECT user_id, strftime(click_ts, '%Y-%m-%d %H:%M:%S'), NULL FROM uc
    UNION ALL
    SELECT user_id, NULL, strftime(purchase_ts, '%Y-%m-%d %H:%M:%S') FROM up
    """,
)(stream_stream_full_outer_join)


def stream_stream_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT SEMI join — converted clicks only: a click
    emits (once, without purchase columns) as soon as SOME purchase in
    its 30-minute window arrives, and state still evicts on the same
    dual watermarks. Distinct from the inner form in both output shape
    (no row multiplication per matching purchase) and state behavior (a
    matched click can be dropped immediately). Finite feed ⇒ equals the
    batch EXISTS, which needs no watermark modeling in the oracle —
    unmatched clicks simply never emit."""
    stream = _events_stream(spark, sf_dir)
    clicks, purchases, cond = _clicks_purchases(stream)
    joined = clicks.join(
        purchases,
        cond,
        "leftSemi",
    )
    name = f"stream_ss_semi_{next(_counter)}"
    q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.col("c_user").alias("user_id"),
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_at"),
    )


register(
    "streaming_stream_stream_semi",
    oracle="""
    SELECT c.user_id, strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_at
    FROM events c
    WHERE c.event_type = 'click'
      AND EXISTS (SELECT 1 FROM events p
                  WHERE p.event_type = 'purchase'
                    AND p.user_id = c.user_id
                    AND p.ts >= c.ts
                    AND p.ts <= c.ts + INTERVAL 30 MINUTE)
    """,
)(stream_stream_semi_join)


def sliding_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING event-time windows (2-hour window, 1-hour slide): every
    event lands in exactly two overlapping windows — the
    moving-aggregate view a monitoring pipeline reads. Complete mode +
    finite feed ⇒ equals the batch expansion the oracle runs (each
    event duplicated into its two window starts)."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    name = f"stream_sliding_{next(_counter)}"
    q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n",
        "total_value",
    )


register(
    "streaming_sliding_counts",
    oracle="""
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM (SELECT value,
                 unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                         date_trunc('hour', ts)]) AS ws
          FROM events)
    GROUP BY ws
    """,
)(sliding_window_stream)


def dedup_within_watermark_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DEDUPLICATION: dropDuplicatesWithinWatermark on
    (user_id, event_type) — the stream-side twin of exact dedup, with
    state bounded by the watermark instead of growing forever (the
    plain dropDuplicates alternative keys state on every value seen).
    Each first occurrence is emitted immediately (dedup is a filter,
    not an aggregation, so append mode never holds rows back); with the
    finite file feed every duplicate arrives inside the watermark, so
    the output is exactly the batch DISTINCT — which the oracle checks."""
    stream = _events_stream(spark, sf_dir)
    deduped = (
        stream.withWatermark("ts", "30 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    name = f"stream_dedup_{next(_counter)}"
    q = deduped.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


register(
    "streaming_dedup_watermark",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)(dedup_within_watermark_stream)


def _upsert_store_paths(base: str) -> tuple[str, str, str]:
    """(feed dir, store base dir, checkpoint dir) under one scratch
    root."""
    import os

    return (
        os.path.join(base, "feed"),
        os.path.join(base, "store"),
        os.path.join(base, "ckpt"),
    )


def _make_upsert_merge(spark: SparkSession, store_base: str):
    """Build the idempotent foreachBatch merge for the per-user running
    state store (n_events, last_ts, total_value).

    The exactly-once recipe on plain object storage, in three rules:
    (1) each micro-batch is pre-aggregated to one row per key (the only
    corpus-sized work, map-side combinable); (2) the store update is
    read-current → full-outer merge → write-NEW-version → atomically
    repoint, never in-place mutation; (3) the applied batch_id set is
    versioned WITH the store, so a redelivered batch (failure/retry
    replay) is detected and skipped — applying it twice would
    double-count. Returns ``merge(batch_df, batch_id)``."""
    import json
    import os

    os.makedirs(store_base, exist_ok=True)
    pointer = os.path.join(store_base, "CURRENT")

    def current() -> dict | None:
        if not os.path.exists(pointer):
            return None
        with open(pointer) as fh:
            return json.load(fh)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        cur = current()
        applied = set(cur["applied"]) if cur else set()
        if batch_id in applied:
            return  # redelivered batch: already folded in, skip
        part = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("ts").alias("last_ts"),
            F.sum("value").alias("total_value"),
        )
        if cur is not None:
            old = batch_df.sparkSession.read.parquet(
                os.path.join(store_base, cur["version"])
            )
            o, p = old.alias("o"), part.alias("p")
            part = o.join(p, F.col("o.user_id") == F.col("p.user_id"), "full_outer").select(
                F.coalesce(F.col("o.user_id"), F.col("p.user_id")).alias("user_id"),
                (
                    F.coalesce(F.col("o.n_events"), F.lit(0))
                    + F.coalesce(F.col("p.n_events"), F.lit(0))
                ).alias("n_events"),
                F.greatest(F.col("o.last_ts"), F.col("p.last_ts")).alias("last_ts"),
                (
                    F.coalesce(F.col("o.total_value"), F.lit(0.0))
                    + F.coalesce(F.col("p.total_value"), F.lit(0.0))
                ).alias("last_total"),
            ).withColumnRenamed("last_total", "total_value")
        version = f"v{batch_id}_{len(applied)}"
        part.write.mode("overwrite").parquet(os.path.join(store_base, version))
        tmp = pointer + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": version, "applied": sorted(applied | {batch_id})}, fh)
        os.replace(tmp, pointer)  # atomic repoint = the commit

    merge.current = current  # type: ignore[attr-defined]
    return merge


def foreach_batch_upsert_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch EXACTLY-ONCE upsert — the sink pattern for keyed
    state on storage with no transactional table format: the event feed
    is split into 4 files and streamed one file per micro-batch
    (``maxFilesPerTrigger=1`` + ``availableNow``), and every batch is
    folded into a per-user running store (event count, last event time,
    value total) through the versioned merge of ``_make_upsert_merge``
    — idempotent under batch redelivery (pinned by
    tests/test_streaming.py). The merge is commutative and associative,
    so ANY batch arrival order yields the batch answer, which the
    oracle checks. At 100 TB: per-batch work is one partial+final agg
    of the batch plus a |keys|-sized merge join; the store is the
    fact-sized side only when the key space is, and then it's a
    bucketed table."""
    from ..plans.relational import _scratch_dir
    from ..sources.parquet import load_table

    base = _scratch_dir("fbupsert", sf_dir)
    # fresh run per invocation: a stale CURRENT pointer/checkpoint from
    # a previous call in this process would mark every batch already
    # applied (idempotence working as designed, but wrong for a rerun)
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    feed, store_base, ckpt = _upsert_store_paths(base)
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value"
    )
    events.repartition(4).write.mode("overwrite").parquet(feed)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    merge = _make_upsert_merge(spark, store_base)
    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import os

    cur = merge.current()
    final = spark.read.parquet(os.path.join(store_base, cur["version"]))
    return final.select(
        "user_id",
        "n_events",
        F.date_format(F.col("last_ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        F.round(F.col("total_value"), 2).alias("total_value"),
    )


register(
    "streaming_foreach_batch_upsert",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
)(foreach_batch_upsert_stream)


def _protobuf_available() -> bool:
    """transformWithStateInPandas requires google.protobuf (Spark's
    state-server protocol runs INSIDE the python workers). The package
    __init__ already exposed the vendored minimal runtime
    (`mapreduce_itwiki_spark/_vendor`, proto3 wire format sufficient
    for StateMessage) on sys.path AND $PYTHONPATH at import time — the
    env export must precede JVM launch because the tws driver worker is
    a separate process built from the JVM's environment. This gate just
    confirms SOME protobuf (real or vendored) resolves."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_stats_tws_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's transformWithStateInPandas — the successor API to
    applyInPandasWithState (typed state variables via a
    StatefulProcessorHandle, timers, composite state). Per-user running
    (count, value-sum) kept in a ValueState; finite feed ⇒ the final
    emission per user equals the batch aggregate the oracle computes."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    # tws keeps each state variable in its own column family, which the
    # default HDFS-backed provider rejects; RocksDB (bundled with Spark
    # 4) is the supported provider. Runtime conf so the driver's vanilla
    # session gets it too (same pattern as the timestamp confs).
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = _events_stream(spark, sf_dir)

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n LONG, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    out = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningStats(),
        outputStructType="user_id long, n_events long, total_value double",
        outputMode="Update",
        timeMode="None",
    )
    name = f"stream_tws_{next(_counter)}"
    q = out.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update-mode sink: keep each user's final (largest-n) emission
    latest = spark.table(name)
    return latest.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.round(F.max_by("total_value", "n_events"), 2).alias("total_value"),
    )


if _protobuf_available():  # container lacks protobuf; see _protobuf_available
    register(
        "streaming_running_stats_tws",
        oracle="""
        SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
        FROM events GROUP BY user_id
        """,
    )(running_stats_tws_stream)


register(
    "streaming_sessionize_stateful",
    oracle="""
    SELECT user_id, count(*) AS n_events, CAST(sum(brk) AS BIGINT) AS n_sessions
    FROM (
      SELECT user_id,
             CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS brk
      FROM (
        SELECT user_id, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                 AS prev_us
        FROM events))
    GROUP BY user_id
    """,
)(sessionize_stream)


def chained_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful operators (Spark >= 3.4): a 10-minute windowed
    count re-aggregated into an hourly rollup (max + sum of the 10-min
    counts per event_type) INSIDE one streaming query — two stateful
    window aggregations back to back, the shape that used to require
    two jobs with an intermediate sink. The second groupBy windows over
    the FIRST window's struct column (`F.window(w10, "1 hour")`), which
    is what makes operator chaining legal in append mode.

    Append-mode semantics are part of the contract: a window emits only
    once the watermark (max event time − delay; delay 0 here) passes
    its END, so the trailing partial hour of the feed never emits — the
    oracle replays exactly that visibility rule with
    `hour_end <= max(ts)` rather than pretending the batch answer and
    the streaming answer coincide. At 100 TB-equivalent event rates
    this chaining halves the state-store traffic vs two queries and
    needs no intermediate topic/table."""
    stream = _events_stream(spark, sf_dir)
    ten = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "10 minutes").alias("w10"), "event_type")
        .agg(F.count(F.lit(1)).alias("n10"))
    )
    hourly = (
        ten.groupBy(F.window(F.col("w10"), "1 hour").alias("w60"), "event_type")
        .agg(F.max("n10").alias("max_10min_n"), F.sum("n10").alias("n_total"))
    )
    name = f"stream_chained_{next(_counter)}"
    q = (
        hourly.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.date_format("w60.start", "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"),
        "event_type",
        "max_10min_n",
        "n_total",
    )


register(
    "streaming_chained_windows",
    # the WHERE clause is the append-mode visibility rule: a window is
    # emitted once the final watermark (= max event time, delay 0)
    # passes its end — the trailing partial hour stays in state
    oracle="""
    WITH mx AS (SELECT max(ts) AS m FROM events),
    t10 AS (SELECT time_bucket(INTERVAL '10 minutes', ts) AS b10, event_type,
                   count(*) AS n10
            FROM events GROUP BY 1, 2)
    SELECT strftime(time_bucket(INTERVAL '1 hour', b10), '%Y-%m-%d %H:%M:%S')
             AS hour_bucket,
           event_type, max(n10) AS max_10min_n,
           CAST(sum(n10) AS BIGINT) AS n_total
    FROM t10
    WHERE time_bucket(INTERVAL '1 hour', b10) + INTERVAL '1 hour'
            <= (SELECT m FROM mx)
    GROUP BY 1, 2
    """,
)(chained_window_stream)


def seasonal_anomaly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC anomaly scoring — the deployment shape of
    seasonal_hour_anomaly (plans/ml_features.py): the hour-of-day
    baseline (μ, σ) is fitted in BATCH over the history table,
    broadcast into the stream, and each arriving event's residual
    z-score is flagged beyond 3σ; the streaming agg rolls anomaly
    counts up per hour-of-day. This is the canonical
    model-trained-offline / scored-online split: the 24-row baseline
    is a broadcast stream-static join (no stream-side state), the
    rollup a complete-mode aggregation. Same rounding discipline as
    the batch twin, so the finite file feed drains to the exact batch
    answer."""
    from ..sources.parquet import load_table

    stream = _events_stream(spark, sf_dir)
    batch = load_table(spark, sf_dir, "events")
    g = batch.groupBy(F.hour("ts").alias("hod")).agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.round(F.stddev_pop("value"), 6).alias("sd"),
    )
    z = F.round(
        (F.col("value") - F.col("mu")) / F.nullif(F.col("sd"), F.lit(0.0)), 6
    )
    # coalesce: a zero-variance hour yields z=NULL (guarded divisor) on
    # both engines; the rollup counts it as not-anomalous, matching the
    # oracle's CASE ... ELSE 0
    enriched = (
        stream.withColumn("hod", F.hour("ts"))
        .join(F.broadcast(g), "hod")
        .withColumn(
            "is_anom", F.coalesce((F.abs(z) > 3.0).cast("int"), F.lit(0))
        )
    )
    agg = enriched.groupBy("hod").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("is_anom").cast("long").alias("n_anomalies"),
    )
    name = f"stream_anomaly_{next(_counter)}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.col("hod").cast("int").alias("hod"), "n_events", "n_anomalies"
    )


register(
    "streaming_seasonal_anomaly",
    oracle="""
    WITH g AS (
      SELECT date_part('hour', ts) AS hod,
             round(avg(value), 6) AS mu,
             round(stddev_pop(value), 6) AS sd
      FROM events GROUP BY 1)
    SELECT CAST(e.hod AS INTEGER) AS hod,
           count(*) AS n_events,
           CAST(sum(CASE WHEN abs(round((e.value - g.mu) / nullif(g.sd, 0), 6))
                              > 3.0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM (SELECT date_part('hour', ts) AS hod, value FROM events) e
    JOIN g ON g.hod = e.hod
    GROUP BY 1
    """,
)(seasonal_anomaly_stream)


def neardup_ingest_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest NEAR-DUP screening against the PERSISTED corpus
    minhash index — the streaming lift of neardup_incremental_index,
    and the shape a 100 TB ingest pipeline actually runs: documents
    arrive as a stream (here: the new-batch half of the documents table
    split into 3 files, one micro-batch each via maxFilesPerTrigger=1 +
    availableNow), and every micro-batch probes the index through
    foreachBatch — batch-sized MinHash hashing, a driver-derived pkey
    IN-list (static partition pruning of the index), the frozen ``bsz``
    hot-bucket cap as a pushed predicate, and a broadcast of the batch
    band rows (zero corpus shuffles per batch) — appending one verdict
    row per ingested doc: (doc_id, n_corpus_candidates,
    neardup_of_corpus). Per-doc verdicts depend only on the persisted
    index, never on co-batched docs, so the drained result is
    batch-partitioning-invariant and equals the batch answer — which is
    exactly what the oracle checks."""
    import os
    import shutil

    from ..operators import dedup as D
    from ..plans.llm_pipeline import _ensure_minhash_index, _mh_split
    from ..plans.relational import _scratch_dir
    from ..sources.parquet import load_table

    idx_path = _ensure_minhash_index(spark, sf_dir)
    base = _scratch_dir("ndingest", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    feed, out, ckpt = (os.path.join(base, d) for d in ("feed", "out", "ckpt"))
    batch_docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") >= _mh_split(spark, sf_dir))
        .select("doc_id", "text")
    )
    batch_docs.repartition(3).write.mode("overwrite").parquet(feed)
    stream = (
        spark.readStream.schema(batch_docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )

    def probe(bdf: DataFrame, batch_id: int) -> None:
        cands = D.neardup_candidates_against_index(spark, idx_path, bdf)
        roll = cands.groupBy(F.col("doc_b").alias("doc_id")).agg(
            F.count(F.lit(1)).alias("n_corpus_candidates")
        )
        (
            bdf.select("doc_id")
            .join(roll, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(F.col("n_corpus_candidates"), F.lit(0)).alias(
                    "n_corpus_candidates"
                ),
            )
            .withColumn("neardup_of_corpus", F.col("n_corpus_candidates") > 0)
            # verdict idempotence (ADVICE r8): foreachBatch is
            # at-least-once, so verdicts land in a batch_id partition
            # via dynamic partition overwrite — a re-fired batch
            # replaces its own rows instead of duplicating them.
            # Clustered like the index writers (r11, guide §6/§2.5):
            # batch_id is ONE value per write, so the doc_id salt alone
            # sizes the write to a single wave of evenly loaded tasks.
            .withColumn("batch_id", F.lit(int(batch_id)))
            .transform(
                lambda d: salted_by_partition(d, "batch_id", "doc_id", n_dirs=1)
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out)
        )

    q = (
        stream.writeStream.foreachBatch(probe)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).drop("batch_id")


def _neardup_ingest_oracle() -> str:
    from ..operators import dedup
    from ..plans.llm_pipeline import (
        _BANDS_UNION,
        _MH_SPLIT_SQL,
        _SHINGLES,
        _SIG_AGREE,
        _SIG_EXPRS,
    )

    return f"""
    WITH sp AS ({_MH_SPLIT_SQL}),
    sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
    sig AS (SELECT doc_id, {_SIG_EXPRS} FROM sh),
    bands AS ({_BANDS_UNION}),
    cbf AS (
      SELECT doc_id, band_id, band_key
      FROM (SELECT *, count(*) OVER (PARTITION BY band_id, band_key) AS bsz
            FROM bands WHERE doc_id < (SELECT s FROM sp))
      WHERE bsz <= {dedup.MINHASH_MAX_BUCKET}),
    qb AS (SELECT doc_id, band_id, band_key FROM bands
           WHERE doc_id >= (SELECT s FROM sp)),
    cand AS (
      SELECT DISTINCT c.doc_id AS da, q.doc_id AS db
      FROM cbf c JOIN qb q
        ON c.band_id = q.band_id AND c.band_key = q.band_key
      JOIN sig sa ON sa.doc_id = c.doc_id
      JOIN sig sb ON sb.doc_id = q.doc_id
      WHERE c.doc_id <> q.doc_id
        AND ({_SIG_AGREE}) >= {dedup.MINHASH_MIN_AGREE}),
    roll AS (SELECT db, count(*) AS n FROM cand GROUP BY 1)
    SELECT d.doc_id, CAST(coalesce(r.n, 0) AS BIGINT) AS n_corpus_candidates,
           coalesce(r.n, 0) > 0 AS neardup_of_corpus
    FROM (SELECT doc_id FROM documents WHERE doc_id >= (SELECT s FROM sp)) d
    LEFT JOIN roll r ON r.db = d.doc_id
    """


register("streaming_neardup_ingest", oracle=_neardup_ingest_oracle())(
    neardup_ingest_stream
)


def ann_ingest_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming VECTOR ingest against the persisted ANN index — the
    embedding twin of neardup_ingest_stream, and the shape that keeps a
    100 TB vector index fresh: new embeddings arrive as a stream (the
    top-quarter vec_ids split into 3 files, one micro-batch each), and
    every micro-batch through foreachBatch (1) probes the index for its
    corpus near-neighbors — batch-sized band hashing, driver-derived
    pkey IN-list (static partition pruning), per-bucket work bounded by
    the PROBE_CAP candidate budget (each bucket's md5-first ≤ cap
    members — see ann_candidates_against_index for why a bucket-count
    skip rule would collapse here), candidate embeddings read from the index
    rows themselves (the corpus table is never touched) — and (2)
    APPENDS its own band rows under the two-phase shard rule
    (operators/similarity.py:ann_index_append), so the index the NEXT
    day's batches probe already contains today's vectors. Verdicts are
    restricted to corpus ids, so they depend only on the frozen corpus
    index, never on co-batched or earlier-streamed vectors — the
    drained result is batch-partitioning-invariant and equals the batch
    answer, which is what the oracle checks; the appends' correctness
    is pinned by the ann_index_append unit invariants instead. Columns:
    (vec_id, n_corpus_candidates, nearest_corpus_cosine)."""
    import shutil

    from ..operators import similarity as S
    from ..plans.llm_pipeline import _vec_split
    from ..plans.relational import _scratch_dir
    from ..sources.parquet import load_table

    s = _vec_split(spark, sf_dir)
    base = _scratch_dir("annin", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    feed, out, ckpt, idx = (
        os.path.join(base, d) for d in ("feed", "out", "ckpt", "idx")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    S.ann_index_write(emb.filter(F.col("vec_id") < s), idx)
    batch = emb.filter(F.col("vec_id") >= s).select("vec_id", "embedding")
    batch.repartition(3).write.mode("overwrite").parquet(feed)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )

    done_dir = os.path.join(base, "done")
    os.makedirs(done_dir, exist_ok=True)

    def probe_and_append(bdf: DataFrame, batch_id: int) -> None:
        # idempotence (ADVICE r7 + r8): foreachBatch is at-least-once.
        # The VERDICT write overwrites its own batch_id partition
        # (dynamic partition overwrite), so it is idempotent on its own
        # — a crash anywhere and a retry replaces, never duplicates,
        # the batch's verdict rows. The INDEX append stays a blind
        # parquet append (a re-fired completed batch would double its
        # band rows, breaking the ≤ cap-per-shard invariant), so the
        # marker — written LAST — still guards it; a crash BETWEEN the
        # index append and the marker still needs the
        # stage-to-batch_id-prefix + atomic-commit pattern a production
        # object-store deployment would use.
        marker = os.path.join(done_dir, f"batch-{batch_id}")
        if os.path.exists(marker):
            return
        cands = S.ann_candidates_against_index(spark, idx, bdf, corpus_max_id=s - 1)
        roll = cands.groupBy(F.col("qid").alias("vec_id")).agg(
            F.count(F.lit(1)).alias("n_corpus_candidates"),
            F.max("cosine").alias("nearest_corpus_cosine"),
        )
        (
            bdf.select("vec_id")
            .join(roll, "vec_id", "left")
            .select(
                "vec_id",
                F.coalesce(F.col("n_corpus_candidates"), F.lit(0)).alias(
                    "n_corpus_candidates"
                ),
                "nearest_corpus_cosine",
            )
            .withColumn("batch_id", F.lit(int(batch_id)))
            # clustered like the index writers (r11): vec_id salt, one
            # write wave — see the neardup ingest writer
            .transform(
                lambda d: salted_by_partition(d, "batch_id", "vec_id", n_dirs=1)
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out)
        )
        S.ann_index_append(spark, idx, bdf)
        open(marker, "w").close()

    q = (
        stream.writeStream.foreachBatch(probe_and_append)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).drop("batch_id")


def _ann_ingest_oracle() -> str:
    from ..operators.similarity import PROBE_CAP
    from ..plans.llm_pipeline import (
        _BITS_SQL,
        _VEC_BANDS_SQL,
        _VEC_CORP_CAPPED_SQL,
        _VEC_SPLIT_SQL,
    )

    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      {_BITS_SQL} AS bits FROM embeddings),
    sp AS ({_VEC_SPLIT_SQL}),
    bands AS ({_VEC_BANDS_SQL}),
    corp AS ({_VEC_CORP_CAPPED_SQL}),
    qb AS (SELECT vec_id, band_id, band_key FROM bands
           WHERE vec_id >= (SELECT s FROM sp)),
    cand AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
             FROM corp c
             JOIN qb q ON c.band_id = q.band_id
                      AND c.band_key = q.band_key
             WHERE c.rn <= {PROBE_CAP}),
    scored AS (SELECT cand.qid,
                      round(list_dot_product(a.v, b.v) /
                            (sqrt(list_dot_product(a.v, a.v)) *
                             sqrt(list_dot_product(b.v, b.v))), 6) AS cos
               FROM cand
               JOIN e a ON a.vec_id = cand.qid
               JOIN e b ON b.vec_id = cand.cid),
    roll AS (SELECT qid, count(*) AS n_corpus_candidates,
                    max(cos) AS nearest_corpus_cosine
             FROM scored GROUP BY qid)
    SELECT nb.vec_id,
           COALESCE(r.n_corpus_candidates, 0) AS n_corpus_candidates,
           r.nearest_corpus_cosine
    FROM (SELECT DISTINCT vec_id FROM qb) nb
    LEFT JOIN roll r ON r.qid = nb.vec_id
    """


register("streaming_ann_ingest", oracle=_ann_ingest_oracle())(ann_ingest_stream)


def make_ivfpq_probe_append(
    spark: SparkSession,
    idx: str,
    out: str,
    done_dir: str,
    corpus: DataFrame,
    corpus_max_id: int,
):
    """The IVFPQ ingest foreachBatch callback as a testable factory
    (VERDICT r9 #7 — the redelivery contract must be unit-pinnable,
    like ``_make_upsert_merge``): per (batch_df, batch_id),

    * VERDICTS are written by batch_id-partitioned DYNAMIC OVERWRITE
      (ADVICE r8's idempotence rule): a redelivered batch replaces its
      own verdict partition, never duplicating rows under another
      batch's.
    * the CODE-TABLE append (blind ``mode("append")`` into the cid
      partitions) is guarded by the done-marker written LAST: a
      redelivered batch whose marker exists is a no-op, and a crash
      between append and marker replays the batch whole — verdict
      overwrite absorbs the replay, and the append re-runs only if it
      never completed (at-least-once storage append + idempotent
      verdicts = exactly-once observable state once the marker lands).
    """
    from ..operators import similarity as S

    def probe_and_append(bdf: DataFrame, batch_id: int) -> None:
        marker = os.path.join(done_dir, f"batch-{batch_id}")
        if os.path.exists(marker):
            return
        verdicts = S.ivfpq_probe_batch(
            spark, idx, bdf, corpus, corpus_max_id=corpus_max_id
        )
        (
            verdicts.withColumnRenamed("qid", "vec_id")
            .withColumn("batch_id", F.lit(int(batch_id)))
            # clustered like the index writers (r11): vec_id salt, one
            # write wave — see the neardup ingest writer
            .transform(
                lambda d: salted_by_partition(d, "batch_id", "vec_id", n_dirs=1)
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out)
        )
        S.ivfpq_index_append(spark, idx, bdf)
        open(marker, "w").close()

    return probe_and_append


def ivfpq_ingest_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming vector ingest against the persisted IVF-PQ index —
    the COMPRESSED-tier twin of ann_ingest_stream, and the shape a
    100 TB deployment actually runs once the float index no longer
    fits its storage budget: the corpus lives as PQ_M-byte codes
    partitioned by cell, new embeddings stream in (top-quarter vec_ids,
    3 files, one micro-batch each), and every micro-batch through
    foreachBatch (1) probes the code index for its nearest corpus
    neighbor — nprobe cells per query against the broadcast centroids,
    each probed cell's md5-first PROBE_CAP members ADC-scored from
    their byte codes, the per-query ADC-top shortlist exact-reranked
    via a rerank-bounded semi-join of the corpus floats
    (operators/similarity.py:ivfpq_probe_batch) — and (2) APPENDS its
    own codes under the frozen quantizers
    (similarity.ivfpq_index_append), so tomorrow's batches probe an
    index that already contains today's vectors. Verdicts are
    corpus-restricted (batch-partitioning-invariant, which is what the
    oracle replays); appends are idempotent per batch_id (the marker
    rule, ADVICE r7). Columns: (vec_id, n_corpus_candidates,
    nearest_corpus_cosine)."""
    import shutil

    from ..operators import similarity as S
    from ..plans.llm_pipeline import _vec_split
    from ..plans.relational import _scratch_dir
    from ..sources.parquet import load_table

    s = _vec_split(spark, sf_dir)
    base = _scratch_dir("ivfpqin", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    feed, out, ckpt, idx = (
        os.path.join(base, d) for d in ("feed", "out", "ckpt", "idx")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") < s)
    S.ivfpq_index_write(corpus, idx)
    batch = emb.filter(F.col("vec_id") >= s).select("vec_id", "embedding")
    batch.repartition(3).write.mode("overwrite").parquet(feed)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    done_dir = os.path.join(base, "done")
    os.makedirs(done_dir, exist_ok=True)
    probe_and_append = make_ivfpq_probe_append(
        spark, idx, out, done_dir, corpus, corpus_max_id=s - 1
    )

    q = (
        stream.writeStream.foreachBatch(probe_and_append)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).drop("batch_id")


def _ivfpq_ingest_oracle() -> str:
    from ..operators.similarity import IVF_NPROBE, PQ_RERANK, PROBE_CAP
    from ..plans.llm_pipeline import _IVFPQ_INCR_CTES, _pq_subdist

    qdist = (
        "round(list_sum(list_transform(range(1, 65), "
        "i -> (qv.v[i] - c.cv[i]) * (qv.v[i] - c.cv[i]))), 6)"
    )
    return f"""
    {_IVFPQ_INCR_CTES},
    qv AS (SELECT vec_id AS qid, v FROM alle
           WHERE vec_id >= (SELECT s FROM sp)),
    probe AS (SELECT qid, cid AS cell FROM (
                SELECT qv.qid, c.cid,
                       row_number() OVER (PARTITION BY qv.qid
                           ORDER BY {qdist}, c.cid) AS rn
                FROM ivc1 c CROSS JOIN qv) WHERE rn <= {IVF_NPROBE}),
    crank AS (SELECT vec_id, cid AS cell,
                     row_number() OVER (PARTITION BY cid
                         ORDER BY md5(CAST(cid AS VARCHAR) || ':'
                                      || CAST(vec_id AS VARCHAR)),
                                  vec_id) AS crn
              FROM ivlists WHERE vec_id < (SELECT s FROM sp)),
    cand AS (SELECT p.qid, c.vec_id FROM crank c JOIN probe p USING (cell)
             WHERE c.crn <= {PROBE_CAP}),
    qs AS (SELECT vec_id AS qid, s, sv FROM sub
           WHERE vec_id >= (SELECT s FROM sp)),
    dt AS (SELECT qs.qid, c.s, c.cid,
                  CAST(round({_pq_subdist('qs')} * 1000000.0) AS BIGINT) AS dti
           FROM c1 c JOIN qs ON c.s = qs.s),
    adc AS (SELECT cand.qid, cand.vec_id, sum(dti) AS adc
            FROM cand JOIN enc ON enc.vec_id = cand.vec_id
            JOIN dt ON dt.qid = cand.qid AND dt.s = enc.s AND dt.cid = enc.cid
            GROUP BY cand.qid, cand.vec_id),
    short AS (SELECT qid, vec_id FROM (
                SELECT qid, vec_id,
                       row_number() OVER (PARTITION BY qid
                                          ORDER BY adc, vec_id) AS rn
                FROM adc) WHERE rn <= {PQ_RERANK}),
    scored AS (SELECT short.qid,
                      round(list_dot_product(a.v, q.v) /
                            (sqrt(list_dot_product(a.v, a.v)) *
                             sqrt(list_dot_product(q.v, q.v))), 6) AS cos
               FROM short
               JOIN alle a ON a.vec_id = short.vec_id
               JOIN qv q ON q.qid = short.qid),
    ncand AS (SELECT qid, count(DISTINCT vec_id) AS n_corpus_candidates
              FROM cand GROUP BY qid),
    best AS (SELECT qid, max(cos) AS nearest_corpus_cosine
             FROM scored GROUP BY qid)
    SELECT q.qid AS vec_id,
           COALESCE(n.n_corpus_candidates, 0) AS n_corpus_candidates,
           b.nearest_corpus_cosine
    FROM (SELECT DISTINCT qid FROM qv) q
    LEFT JOIN ncand n ON n.qid = q.qid
    LEFT JOIN best b ON b.qid = q.qid
    """


register("streaming_ivfpq_ingest", oracle=_ivfpq_ingest_oracle())(
    ivfpq_ingest_stream
)
