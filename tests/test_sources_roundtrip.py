"""Source/sink round-trips beyond parquet: JSON, ORC, CSV — written from
the driver tables and read back with EXPLICIT schemas (never inference
in a pipeline, SURVEY.md §1 'declare explicit StructTypes'). JDBC and
Delta/Iceberg need jars absent from this environment; their absence is
asserted import-style so the gap is visible, not silent."""

from __future__ import annotations

from mapreduce_itwiki_spark.sources.parquet import load_table

from conftest import SF_SMALL


def _orders(spark):
    return load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def _assert_same_rows(a, b):
    ka = sorted(map(tuple, a.collect()))
    kb = sorted(map(tuple, b.collect()))
    assert ka == kb


def test_json_roundtrip(spark, tmp_path):
    src = _orders(spark)
    out = str(tmp_path / "orders_json")
    src.write.mode("overwrite").json(out)
    back = spark.read.schema(src.schema).json(out)
    _assert_same_rows(src, back)


def test_orc_roundtrip(spark, tmp_path):
    src = _orders(spark)
    out = str(tmp_path / "orders_orc")
    src.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == src.schema  # ORC carries its schema
    _assert_same_rows(src, back)


def test_csv_roundtrip_explicit_schema(spark, tmp_path):
    src = _orders(spark)
    out = str(tmp_path / "orders_csv")
    src.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double"
    ).option("header", True).csv(out)
    _assert_same_rows(src, back)


def test_unavailable_connectors_fail_loudly(spark, tmp_path):
    """Delta/Iceberg jars are not in this image; the engine treats them
    as explicitly-absent connectors (README 'stub behind import-try'),
    so a format request must raise, not silently misbehave."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises((AnalysisException, Py4JJavaError, Exception)):
        _orders(spark).write.format("delta").save(str(tmp_path / "delta"))


def test_python_datasource_pushdown_prunes_partitions():
    """SynthDocsReader.pushFilters narrows the split range at planning
    time: range predicates on id are consumed (not yielded back) and
    partitions() emits splits only inside the narrowed bounds."""
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    from mapreduce_itwiki_spark.sources.pyds import SynthDocsReader

    r = SynthDocsReader({"n": "5000", "parts": "8"})
    assert len(r.partitions()) == 8
    leftovers = list(
        r.pushFilters([GreaterThanOrEqual(("id",), 4000), LessThan(("id",), 4500)])
    )
    assert leftovers == []  # both consumed by the reader
    parts = r.partitions()
    bounds = [p.value for p in parts]
    assert all(lo >= 4000 and hi <= 4500 for lo, hi in bounds), bounds
    covered = sorted(x for lo, hi in bounds for x in (lo, hi))
    assert min(covered) == 4000 and max(covered) == 4500
