"""RDD-API twin of the link-graph pipeline — the literal
map/shuffle/reduce translation of the reference
(``/root/reference/src/mr/CountReference.java``), kept as a documented
comparison path and correctness cross-check.

The DataFrame version (operators/linkgraph.py) is the production path:
Catalyst gives it partial aggregation, whole-stage codegen, AQE, and
column pruning that this RDD version must hand-roll (note the explicit
map-side-combining ``reduceByKey``/``distinct`` — the RDD analog of the
combiner the reference forgot to register). Benchmarks show the
DataFrame path strictly faster; this module exists because the
reference IS a MapReduce program, so its paradigm deserves a faithful,
tested Spark-RDD rendering (SURVEY.md §1 'Spark target abstractions').
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..functions.wiki import LINK_PATTERN, NAMESPACE_BLACKLIST

_LINK_RE = re.compile(LINK_PATTERN)  # '.' does not cross newlines, like Java
_STRIP_RE = re.compile(r"[\[\],]")

COUNTS_SCHEMA = StructType(
    [StructField("page_title", StringType()), StructField("count", LongType())]
)


def _map_page(title: str, text: str) -> list[tuple[str, str]]:
    """Mapper1 (CountReference.java:246-266): regex flatMap → pipe split →
    namespace substring filter → strip/trim → (page_to, page_from)."""
    out = []
    src = title.strip()
    for m in _LINK_RE.finditer(text):
        link = m.group(0)
        if "|" in link:
            link = link.split("|", 1)[0]
        if any(ns in link for ns in NAMESPACE_BLACKLIST):
            continue
        target = _STRIP_RE.sub("", link).strip()
        if target:
            out.append((target, src))
    return out


def incoming_reference_counts_rdd(spark: SparkSession, pages: DataFrame) -> DataFrame:
    """pages(title, text) → DataFrame(page_title, count), RDD-style.

    Two shuffles, exactly the reference's two jobs — but with map-side
    combining on both (``distinct`` plans a reduceByKey under the hood;
    ``reduceByKey`` sums partials before the exchange), fixing the
    missing-combiner inefficiency of CountReference.java:322-356."""
    counts = (
        pages.rdd.flatMap(lambda row: _map_page(row.title, row.text))
        .distinct()  # Job 1: distinct (page_to, page_from) — O8
        .map(lambda pair: (pair[0], 1))  # Mapper2 — O9 without the FS round-trip
        .reduceByKey(lambda a, b: a + b)  # Reducer2 with combiner — O10
        .sortByKey()  # O11: range-partitioned total sort
        .map(lambda kv: (kv[0], kv[1]))
    )
    return spark.createDataFrame(counts, COUNTS_SCHEMA)
