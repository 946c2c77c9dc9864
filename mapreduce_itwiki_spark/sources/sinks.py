"""Output sinks.

The reference's sink is a single CSV with a literal ``page_title,count``
header, written by the lone reducer and then file-copied by the driver
(``/root/reference/src/mr/CountReference.java:292-304,335,365-377``).
Its header trick is only correct because there is exactly one reducer;
Spark's CSV writer handles headers per-file natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv_with_header(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV sink (O12). ``single_file=True`` reproduces the reference's
    one-file artifact via ``coalesce(1)`` — fine for small exports, wrong
    at 100 TB; the default writes one header-bearing part per partition.
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_partitioned_parquet(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Scale-path sink: partitioned parquet, the 100 TB default."""
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
