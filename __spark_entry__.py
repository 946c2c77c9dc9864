"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference pipeline shape —
tokenize → distinct pairs → count distinct sources → sort, see
``mapreduce_itwiki_spark/plans/reference.py:wiki_incoming_refs``) on
sf0.001. ``queries()``/``oracle_sql()`` expose the full catalog
(``mapreduce_itwiki_spark/plans``), one entry per implemented operator
from SURVEY.md §2, column-name-aligned with their DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# robust under import-by-path: make the package resolvable regardless of CWD
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from mapreduce_itwiki_spark.plans import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.queries()["wiki_incoming_refs"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query;
    rows-only ops (mapInPandas feature extraction) are omitted."""
    return catalog.oracles()
