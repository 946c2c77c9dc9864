"""Same-JVM interleaved A/B for the duplicate_spans shared exchange
(round 5): AQE-coalescible bare repartition(fp) vs an explicit 256
partition count. Recorded (TUNING.md): sf20z aqe [64.0, 48.3, 50.4]
vs fixed256 [52.5, 46.9, 39.3] — fixed wins ~19% at this scale but is
3x slower at sf0.1 and not AQE-coalescible; the bare form shipped.

Usage: python tools/ab_spans.py SF_DIR
"""
import os, sys, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from mapreduce_itwiki_spark.session import get_spark
from mapreduce_itwiki_spark.sources.parquet import load_table
from mapreduce_itwiki_spark.plans import training_data as td

spark = get_spark("ab_spans")
docs = load_table(spark, sys.argv[1], "documents")

def variant(n_explicit):
    g = td._gram_rows(docs, td.SPAN_K)
    g = g.repartition(n_explicit, F.col("fp")) if n_explicit else g.repartition(F.col("fp"))
    dup = (g.groupBy("fp")
             .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
             .filter(F.col("lo") < F.col("hi")).select("fp"))
    d = g.join(dup, "fp", "left_semi")
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = d.select("doc_id", "pos", (F.col("pos") - F.row_number().over(w)).alias("grp"))
    return isl.groupBy("doc_id", "grp").agg(F.min("pos").alias("s"), F.max("pos").alias("e"))

res = {"aqe": [], "fixed256": []}
for i in range(3):
    for name, n in [("aqe", None), ("fixed256", 256)]:
        t0 = time.perf_counter()
        variant(n).write.mode("overwrite").format("noop").save()
        res[name].append(round(time.perf_counter() - t0, 2))
        print(name, res[name], flush=True)
print("RESULT", res)
