"""The reference pipeline: incoming-reference counts over a link corpus.

This is the whole of ``/root/reference/src/mr/CountReference.java``
(two MapReduce jobs, O1–O13 in SURVEY.md §2) as ONE lazy DataFrame DAG:

    parse → explode links → normalize → filter → dropDuplicates
          → groupBy.count → orderBy

What the reference does with 4 process/FS boundaries (XML scan → Job 1
map → shuffle → reduce → text files → Job 2 map → shuffle → reduce →
CSV copy) Catalyst plans as 2 in-memory hash-aggregate exchanges plus a
range exchange for the total sort. Spark's partial+final aggregation
also fixes the reference's missing combiner (no ``setCombinerClass``
anywhere in ``CountReference.java:322-356``): at 100 TB the map-side
partial dedup/count keeps the shuffle proportional to DISTINCT pairs per
partition, not raw link tuples.

Skew note (M5): hot targets (popular pages) skew the final count
aggregation's keys. The aggregation is already two-phase (partial
counts are computed per-partition before the exchange), so the hot key
arrives pre-combined; AQE's skew handling covers the residual. No
manual salting needed for the count itself because count is
algebraic — documented here so future non-algebraic variants
(collect_set of sources) know to salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import wiki


def extract_link_pairs(pages: DataFrame) -> DataFrame:
    """Pages(title, text) → raw (page_to, page_from) link tuples.

    Mapper1 semantics (``CountReference.java:246-266``): regex explode
    (O3), pipe split (O4), namespace substring filter (O5), bracket/comma
    strip + trim (O6), empty-drop, key projection with trimmed source
    title (O7).
    """
    links = pages.select(
        F.col("title"), F.explode(wiki.extract_raw_links(F.col("text"))).alias("raw")
    )
    links = links.filter(wiki.namespace_keep(wiki.pipe_target(F.col("raw"))))
    links = links.select(
        wiki.normalize_target(wiki.pipe_target(F.col("raw"))).alias("page_to"),
        F.trim(F.col("title")).alias("page_from"),
    )
    return links.filter(F.col("page_to") != "")


def distinct_pairs(links: DataFrame) -> DataFrame:
    """O8 — the semantic heart: one row per distinct (page_to, page_from).

    The reference does this with a full-key sort + grouping comparator at
    a single reducer (``CountReference.java:69-74,269-276,308-320``);
    Catalyst plans ``dropDuplicates`` as partial+final hash aggregate at
    any parallelism.
    """
    return links.dropDuplicates(["page_to", "page_from"])


def incoming_reference_counts(pages: DataFrame) -> DataFrame:
    """Full pipeline → DataFrame(page_title, count) sorted by title.

    ``count`` = number of DISTINCT referencing pages (repeat links from
    one page count once), per ``Reducer1`` + ``Reducer2``
    (``CountReference.java:269-276,298-305``); total order by title per
    the single-reducer sort (O11).
    """
    pairs = distinct_pairs(extract_link_pairs(pages))
    return (
        pairs.groupBy(F.col("page_to").alias("page_title"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("page_title")
    )
