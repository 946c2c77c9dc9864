"""Feature-engineering / distributed-model-fitting queries (north-star
⊕, SURVEY.md §2): the operators that turn a curated corpus into model
inputs — hashed bag-of-words features, leakage-free target encoding,
per-group trend fitting, a distributed logistic-regression training
step, and a skyline (Pareto-frontier) selection. The reference has no
analogue for any of these (SURVEY.md §2 "Categories with NO
implementation"); they complete the LLM-era pipeline story the same
way plans/training_data.py does for curation.

Determinism discipline (same as the PCA/k-means family): every
floating-point reduction is rounded in-query at a precision that
absorbs summation-order drift, every scalar expression is written with
the SAME association order on both engines (IEEE ops are correctly
rounded, so identical operands + identical expression tree = identical
bits), and the logistic link uses the RATIONAL sigmoid surrogate
z ↦ 0.5 + 0.5·z/(1+|z|) (Elliott activation) instead of 1/(1+e^{-z})
— |z|, +, /, * are all correctly-rounded IEEE ops, while exp() is
libm-dependent and may differ between JVMs and DuckDB in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..sources.parquet import load_table
from .catalog import register

HASH_DIMS = 16  #: feature-hashing output dimensionality
LOGREG_LR = 0.5  #: gradient-descent learning rate (power of two: exact scaling)
LOGREG_D = 4  #: leading embedding dims used as logreg features
PRICE_SHARD = 100.0  #: skyline price-shard width (production: quantile bounds)


# --------------------------------------------------------------------------
@register(
    "feature_hash_vectorize",
    oracle=f"""
    SELECT doc_id,
           ('0x' || substr(md5(tok), 1, 15))::BIGINT % {HASH_DIMS} AS dim,
           CAST(sum(CASE WHEN ('0x' || substr(md5(tok), 16, 1))::BIGINT % 2 = 0
                         THEN 1 ELSE -1 END) AS BIGINT) AS feat
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY doc_id, dim
    """,
)
def feature_hash_vectorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HASHING TRICK (Weinberger et al. 2009): vectorize bag-of-words
    into a fixed ``HASH_DIMS``-dimensional signed-count vector with no
    vocabulary pass — dim = hash(token) mod D, sign = ±1 from a second
    hash bit (the sign makes collisions cancel in expectation, the
    property that lets D stay tiny). This is how a 100 TB corpus becomes
    classifier features in ONE explode → map-side hash → (doc, dim)
    partial+final agg: no vocabulary build, no dictionary broadcast, no
    second scan. md5-derived hashing keeps the "random" projection a
    pure function of the data — engine-identical, so even this
    randomized method hash-matches its oracle exactly."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    sign_bit = F.conv(F.substring(F.md5(F.col("tok")), 16, 1), 16, 10).cast("long")
    sign = F.when(sign_bit % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    return (
        tok.select("doc_id", (h % HASH_DIMS).alias("dim"), sign.alias("s"))
        .groupBy("doc_id", "dim")
        .agg(F.sum("s").cast("long").alias("feat"))
    )


# --------------------------------------------------------------------------
@register(
    "target_encode_loo",
    oracle="""
    WITH g AS (SELECT event_type, round(sum(value), 6) AS s, count(*) AS n
               FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           round((g.s - e.value) / (g.n - 1), 6) + 0.0 AS loo_mean
    FROM events e JOIN g ON g.event_type = e.event_type
    """,
)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out TARGET ENCODING — the leakage-free categorical
    encoder of tabular feature engineering: each row's category is
    replaced by the mean target of all OTHER rows in that category,
    loo = (Σ_group − own) / (n_group − 1). Scale shape: the naïve form
    is a window over event_type — low-cardinality, the same
    single-task-per-group scale-killer the shard prefix sums eliminate
    in plans/training_data.py — so this computes the tiny per-category
    (sum, count) frame instead and BROADCASTS it back: the corpus-sized
    stage is one partial+final agg plus a map-side join, bounded tasks
    at any scale. The group sum is rounded once (6 dp absorbs
    summation-order drift) and the subtraction/division then run on
    identical operands in both engines."""
    events = load_table(spark, sf_dir, "events")
    g = events.groupBy("event_type").agg(
        F.round(F.sum("value"), 6).alias("s"), F.count(F.lit(1)).alias("n")
    )
    return events.join(F.broadcast(g), "event_type").select(
        "event_id",
        "event_type",
        (F.round((F.col("s") - F.col("value")) / (F.col("n") - 1), 6) + 0.0).alias(
            "loo_mean"
        ),
    )


# --------------------------------------------------------------------------
@register(
    "ols_trend_per_user",
    oracle="""
    WITH x AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x
      FROM events),
    a AS (
      SELECT user_id, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
             round(sum(value), 6) AS sy, round(sum(x * value), 6) AS sxy
      FROM x GROUP BY user_id HAVING count(*) >= 2),
    s AS (
      SELECT user_id, n, sx, sy,
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope_raw
      FROM a)
    SELECT user_id, CAST(n AS BIGINT) AS n,
           round(slope_raw, 6) + 0.0 AS slope,
           round((sy - slope_raw * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
             + 0.0 AS intercept
    FROM s
    """,
)
def ols_trend_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ORDINARY LEAST SQUARES trend — fit value ~ slope·x + b
    for every user, x = the user's event sequence position (a window
    rank on high-cardinality user_id: bounded tasks). The fit is the
    closed form from five sufficient statistics (n, Σx, Σx², Σy, Σxy) —
    ONE partial+final agg per user, the same "model = a small aggregate"
    shape as k-means/PCA, so fitting millions of per-entity trend models
    over 100 TB of events is a single shuffle on user_id. x-moments are
    exact integers; the two float sums are rounded once (6 dp) and the
    closed form then runs on identical operands with identical
    association order in both engines (sums forced to DOUBLE before
    multiplying so neither engine widens to int128). Built-in
    regr_slope/regr_intercept would stream Welford-style updates whose
    rounding is engine-private — the explicit sufficient statistics are
    what make the fit replayable."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    x = events.select(
        "user_id", "value", F.row_number().over(w).cast("long").alias("x")
    )
    a = (
        x.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.round(F.sum("value"), 6).alias("sy"),
            F.round(F.sum(F.col("x") * F.col("value")), 6).alias("sxy"),
        )
        .filter(F.col("n") >= 2)
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    slope_raw = (nd * F.col("sxy") - sxd * F.col("sy")) / (
        nd * F.col("sxx").cast("double") - sxd * sxd
    )
    return a.select(
        "user_id",
        F.col("n").cast("long").alias("n"),
        (F.round(slope_raw, 6) + 0.0).alias("slope"),
        (F.round((F.col("sy") - slope_raw * sxd) / nd, 6) + 0.0).alias("intercept"),
    )


# --------------------------------------------------------------------------
@register(
    "logreg_gd_steps",
    oracle=f"""
    WITH e AS (SELECT CAST(label % 2 AS DOUBLE) AS y, embedding::DOUBLE[] AS x
               FROM embeddings),
    idx AS (SELECT CAST(unnest(range(1, {LOGREG_D} + 1)) AS INTEGER) AS j),
    g1 AS (SELECT j, round(avg((0.5 - y) * x[j]), 9) AS g1
           FROM e, idx GROUP BY j),
    w1 AS (SELECT j, -{LOGREG_LR} * g1 AS w1 FROM g1),
    w1r AS (SELECT max(CASE WHEN j = 1 THEN w1 END) AS a1,
                   max(CASE WHEN j = 2 THEN w1 END) AS a2,
                   max(CASE WHEN j = 3 THEN w1 END) AS a3,
                   max(CASE WHEN j = 4 THEN w1 END) AS a4
            FROM w1),
    s AS (SELECT y, x,
                 (SELECT a1 FROM w1r) * x[1] + (SELECT a2 FROM w1r) * x[2]
                 + (SELECT a3 FROM w1r) * x[3] + (SELECT a4 FROM w1r) * x[4] AS z
          FROM e),
    err AS (SELECT x, (0.5 + 0.5 * (z / (1 + abs(z)))) - y AS err FROM s),
    g2 AS (SELECT j, round(avg(err * x[j]), 9) AS g2 FROM err, idx GROUP BY j)
    SELECT g2.j, round(w1.w1, 9) + 0.0 AS w1,
           round(w1.w1 - {LOGREG_LR} * g2.g2, 9) + 0.0 AS w2
    FROM g2 JOIN w1 ON w1.j = g2.j
    """,
)
def logreg_gd_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed LOGISTIC-REGRESSION training: two full-batch
    gradient-descent steps on the embedding table (features = leading
    {LOGREG_D} dims, label = label mod 2) — the data-parallel training
    step every large-scale classifier quality filter (fastText-style
    spam/quality models over a 100 TB corpus) runs: gradient = ONE
    partial+final avg per dimension (shuffle carries d partial sums,
    never rows), weights = a d-row frame BROADCAST back for the next
    pass's scoring map. Unrolled two steps with 9-dp-rounded gradients,
    the same replayable-iteration discipline as kmeans_two_rounds and
    the PCA power iteration. The link is the rational sigmoid
    0.5 + 0.5·z/(1+|z|) — correctly-rounded IEEE arithmetic only (libm
    exp() would differ between engines in the last ulp), and σ(0)=0.5
    exactly, so step 1's gradient is the clean linear form (0.5−y)·x.
    Step size 0.5 is a power of two: scaling a rounded gradient stays
    exact. Output: per dimension j, the weights after each step."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        (F.col("label") % 2).cast("double").alias("y"),
        V.as_double(F.slice(F.col("embedding"), 1, LOGREG_D)).alias("x"),
    )
    ex = base.select("y", F.posexplode("x").alias("j0", "xj"))
    g1 = ex.groupBy((F.col("j0") + 1).alias("j")).agg(
        F.round(F.avg((F.lit(0.5) - F.col("y")) * F.col("xj")), 9).alias("g1")
    )
    w1 = g1.select("j", (F.lit(-LOGREG_LR) * F.col("g1")).alias("w1"))
    w1row = w1.agg(
        *[
            F.max(F.when(F.col("j") == d, F.col("w1"))).alias(f"a{d}")
            for d in range(1, LOGREG_D + 1)
        ]
    )
    xi = lambda d: F.element_at(F.col("x"), d)  # noqa: E731
    z = F.col("a1") * xi(1) + F.col("a2") * xi(2) + F.col("a3") * xi(3) + F.col(
        "a4"
    ) * xi(4)
    s = base.crossJoin(F.broadcast(w1row)).select(
        "x",
        (
            (F.lit(0.5) + F.lit(0.5) * (z / (F.lit(1) + F.abs(z)))) - F.col("y")
        ).alias("err"),
    )
    e2 = s.select("err", F.posexplode("x").alias("j0", "xj"))
    g2 = e2.groupBy((F.col("j0") + 1).alias("j")).agg(
        F.round(F.avg(F.col("err") * F.col("xj")), 9).alias("g2")
    )
    return g2.join(F.broadcast(w1), "j").select(
        "j",
        (F.round(F.col("w1"), 9) + 0.0).alias("w1"),
        (F.round(F.col("w1") - F.lit(LOGREG_LR) * F.col("g2"), 9) + 0.0).alias("w2"),
    )


# --------------------------------------------------------------------------
@register(
    "skyline_pareto_parts",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    """,
)
def skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (Pareto-frontier) query — keep every part no other part
    dominates (cheaper-or-equal AND bigger-or-equal, strict somewhere):
    minimize p_retailprice, maximize p_size, the multi-objective
    shortlist operator (Börzsönyi et al., ICDE 2001). The oracle states
    the O(n²) NOT-EXISTS definition; the Spark plan is the O(n log n)
    sort-based form, decomposed for scale exactly like the
    training-data shard prefix sums: dominance(p) reduces to two
    running maxima — max size over STRICTLY cheaper prices (price-group
    frame + within-shard window + broadcast per-shard exclusive-max
    offsets, so no global single-task window) and max size AT the same
    price (the price-group aggregate itself). A part survives iff
    neither exceeds its size. Every corpus-sized stage is an agg or a
    map-side broadcast join; the only ordered windows run over the
    price-group frame sharded by fixed price bands (production would
    pick shard bounds from a quantile sketch)."""
    part = load_table(spark, sf_dir, "part")
    g = (
        part.groupBy("p_retailprice")
        .agg(F.max("p_size").alias("gmax"))
        .withColumn(
            "shard", F.floor(F.col("p_retailprice") / PRICE_SHARD).cast("long")
        )
    )
    w_in = (
        Window.partitionBy("shard")
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g2 = g.withColumn("prev_in", F.max("gmax").over(w_in))
    tot = g.groupBy("shard").agg(F.max("gmax").alias("smax"))
    w_off = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    off = tot.select("shard", F.max("smax").over(w_off).alias("prev_shard"))
    g3 = g2.join(F.broadcast(off), "shard").select(
        "p_retailprice",
        "gmax",
        F.greatest("prev_in", "prev_shard").alias("run_lt"),  # null iff cheapest
    )
    joined = part.join(g3, "p_retailprice")
    dominated = (
        F.col("run_lt").isNotNull() & (F.col("run_lt") >= F.col("p_size"))
    ) | (F.col("gmax") > F.col("p_size"))
    return joined.filter(~dominated).select("p_partkey", "p_retailprice", "p_size")
