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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import register

_counter = itertools.count()


def hourly_event_rollup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hourly (window × event_type) counts + value sums."""
    # events carries TIMESTAMP(NANOS): stream it as nano-longs and truncate
    # to µs in-stream (same read path as sources/parquet.py:load_table)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
