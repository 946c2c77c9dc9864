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
