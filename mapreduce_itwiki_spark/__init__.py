"""mapreduce_itwiki_spark — a PySpark-native analytics engine.

Re-expresses the complete operator surface of the reference Hadoop
MapReduce program (``AlessioScarfone/MapReduce_itwiki``, one two-job
pipeline counting distinct incoming wiki-links per page, see
``/root/reference/src/mr/CountReference.java``) as idiomatic Spark
DataFrame plans, and extends it with the LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) that a
100 TB training-data pipeline needs.

Layout:
    session     SparkSession factory tuned for local[N] and cluster use
    sources     parquet table registry, wiki-XML page source, sinks
    functions   column-expression libraries (wiki link normalization,
                text analysis, vector math) — JVM-side, codegen-friendly
    operators   composed operators (link graph, dedup, similarity,
                multimodal plumbing)
    plans       the query catalog backing the driver contract
                (queries() / oracle_sql())
    streaming   Structured Streaming jobs over the events table
"""

__version__ = "0.1.0"


def _ensure_protobuf_path() -> None:
    """Expose the vendored minimal protobuf runtime (``_vendor/``, see
    its docstring) when no real ``google.protobuf`` is installed.

    Runs at PACKAGE import time because the $PYTHONPATH export must
    precede JVM launch: pyspark's python workers — including the
    transformWithStateInPandas driver worker, a separate process the
    JVM spawns — build their sys.path from the JVM's environment, which
    is frozen when the first SparkSession starts. Every entry path
    (driver contract, bench, tests, sweeps) imports this package before
    creating its session. A real protobuf distribution always wins: the
    vendor dir is only added when the import fails without it."""
    import os
    import sys

    try:
        import google.protobuf  # noqa: F401

        return
    except ImportError:
        pass
    vendor = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_vendor")
    if vendor not in sys.path:
        sys.path.insert(0, vendor)
    existing = os.environ.get("PYTHONPATH", "")
    if vendor not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            vendor + (os.pathsep + existing if existing else "")
        )


_ensure_protobuf_path()
