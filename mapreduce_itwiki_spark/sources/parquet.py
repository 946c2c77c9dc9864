"""Parquet table registry for the driver test data.

The reference's only source is a byte-delimited XML scan
(``/root/reference/src/mr/CountReference.java:94-203``, the Mahout-style
``XmlInputFormat``); see ``xml_pages.py`` for that path. For the
relational/extension surface the engine reads the driver's parquet star
schema (TESTDATA.md). Parquet is the scale-path default: columnar,
splittable, predicate-pushdown + column-pruning friendly — the
``.explain`` of every catalog query should show ``PushedFilters`` /
narrow ``ReadSchema`` on these scans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. No schema inference surprises: parquet carries its
    schema; callers select only the columns they need so Catalyst prunes
    the scan (manual column pruning in the reference is
    ``CountReference.java:228-232``; here it is automatic).

    The events table's timestamp shape has varied by driver round and
    both forms need runtime (not builder) conf, because the driver calls
    these queries on a VANILLA SparkSession:

    - TIMESTAMP(NANOS), which Spark 4 refuses outright
      (PARQUET_TYPE_ILLEGAL): read as nano-epoch longs (legacy conf) and
      truncate to a microsecond timestamp — integer ``div 1000``, the
      same ns→µs truncation DuckDB applies on read.
    - naive micros (isAdjustedToUTC=false), which Spark 4 infers as
      TIMESTAMP_NTZ — a type ``unix_micros``/epoch arithmetic rejects:
      disable NTZ inference so the stored micros read as epoch-micros
      TIMESTAMP, exactly DuckDB's naive-=-UTC semantics."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
