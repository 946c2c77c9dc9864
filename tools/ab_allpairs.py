"""Same-JVM interleaved A/B for the AllPairs ppjoin filters (round 5).

Variants: `old` = prefix+DF-cap candidates only (the shape before the
length/position filters); `ppjoin` = allpairs_pipeline as shipped.
Both materialized alternately in ONE JVM, so host steal hits both.
Recorded runs (TUNING.md): sf5z old [93.6, 89.3] vs ppjoin [96.4,
77.6]; sf20z old [281.6, 333.2] vs ppjoin [320.6, 246.2].

Usage: python tools/ab_allpairs.py SF_DIR
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from mapreduce_itwiki_spark.session import get_spark
from mapreduce_itwiki_spark.sources.parquet import load_table
from mapreduce_itwiki_spark.plans import ml_features as M
from mapreduce_itwiki_spark.operators import dedup

spark = get_spark("ab_allpairs")
docs = dedup._fanout(load_table(spark, sys.argv[1], "documents"), "doc_id")

def old_pipeline(docs, max_df=M.ALLPAIRS_MAX_DF):
    ex = dedup.shingle_rows(docs, distinct=True).withColumnRenamed("s", "g")
    dfreq = ex.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    n_pref = (F.col("n") - F.floor((4 * F.col("n") + 4) / 5) + 1).cast("int")
    prefix = (ex.join(dfreq, "g").groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.array_sort(F.collect_list(F.struct("df", "g"))).alias("ordered"))
        .select("doc_id", F.explode(F.slice(F.col("ordered"), F.lit(1), n_pref)).alias("e"))
        .select("doc_id", F.col("e.df").alias("df"), F.col("e.g").alias("g")))
    prefix = prefix.filter(F.col("df") <= max_df).drop("df")
    cand = (prefix.alias("a").join(prefix.alias("b"), "g")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")).distinct())
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a_rows = ex.select(F.col("doc_id").alias("da"), F.col("g"))
    b_rows = ex.select(F.col("doc_id").alias("db"), F.col("g"))
    inter = (cand.join(a_rows, "da").join(b_rows, ["db", "g"])
        .groupBy("da", "db").agg(F.count(F.lit(1)).alias("i")))
    verified = (inter
        .join(sizes.select(F.col("doc_id").alias("da"), F.col("n_sh").alias("na")), "da")
        .join(sizes.select(F.col("doc_id").alias("db"), F.col("n_sh").alias("nb")), "db")
        .filter(5 * F.col("i") >= 4 * (F.col("na") + F.col("nb") - F.col("i"))))
    return verified.select("da", "db")

res = {"old": [], "ppjoin": []}
for i in range(2):
    for name, fn in [("old", lambda: old_pipeline(docs)),
                     ("ppjoin", lambda: M.allpairs_pipeline(docs).select("da","db"))]:
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        res[name].append(round(time.perf_counter() - t0, 2))
        print(name, res[name], flush=True)
print("RESULT", res)
