"""Relational-completion queries (SURVEY.md §2 ⊕ "relational completion",
§7 M3): joins, windows, top-k, set ops, grouping sets, time bucketing,
JSON extraction, as-of join, sessionization.

The reference has NONE of these (SURVEY.md §2 "categories with no
implementation"); they complete the engine so a relational workload can
switch to it. Scale annotations per query; floats are rounded in-query
on both engines (see catalog.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.inline import values_df
from ..sources.parquet import load_table
from .catalog import register


def broadcast_if_small(df: DataFrame) -> DataFrame:
    """Broadcast hint gated on Catalyst's own size estimate.

    An explicit ``F.broadcast`` OVERRIDES ``autoBroadcastJoinThreshold``
    — hinting a table that is only small at test scale (supplier is
    ~700 M rows at true TPC-H 100 TB) would ship it whole to every
    executor. Below the session threshold the hint is applied (pins the
    plan and spares AQE a runtime re-plan); above it the frame is
    returned unhinted and Catalyst/AQE pick the strategy."""
    spark = df.sparkSession
    thr_str = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try:  # "-1" disables; byteStringAsBytes rejects negatives
        thr = int(thr_str)
    except ValueError:
        thr = spark._jvm.org.apache.spark.util.Utils.byteStringAsBytes(thr_str)
    if thr <= 0:
        return df
    est = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    return F.broadcast(df) if est <= thr else df


# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-side filter, two-key hash agg, 7 aggregates.
    One shuffle; partial aggregation makes the exchange carry ~|groups|
    rows per partition regardless of input scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "join_broadcast_dims",
    oracle="""
    SELECT r.r_name, n.n_name, count(*) AS n_cust, round(avg(c.c_acctbal), 4) AS avg_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join through two broadcast dims — zero shuffles on the fact
    side until the final agg. At 100 TB the broadcast hint is the
    difference between a map-side join and a catastrophic sort-merge."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"), F.round(F.avg("c_acctbal"), 4).alias("avg_bal"))
    )


# --------------------------------------------------------------------------
@register(
    "join_orders_lineitem",
    oracle="""
    SELECT o.o_orderpriority,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join: both sides shuffle on the join key (sort-merge
    or shuffled-hash per AQE); skewed orderkeys are AQE-split. This is the
    join class that dominates 100 TB plans — keep the key co-partitioned
    (bucketing both tables by orderkey removes the shuffle entirely)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "join_orders_lineitem_bucketed",
    oracle="""
    SELECT o.o_orderpriority,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_orders_lineitem_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB layout fix for the fact-fact join: both tables written
    bucketBy(orderkey) once, then every orderkey join is a zero-Exchange
    sort-merge over co-located buckets — the shuffle that dominates
    `join_orders_lineitem` is paid at write time, amortized over every
    subsequent join. Same oracle as the shuffle variant (bucketing is a
    physical property; results are identical). The merge hint keeps the
    planner on the bucket-aligned SMJ path regardless of table size; the
    plan gate in tests/test_plan_quality.py asserts the join has no
    Exchange on either side."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    import shutil

    sf_tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1].replace(".", "_")
    # per-process suffix: bench and pytest may run concurrently against
    # the same warehouse dir — without it, one session's overwrite races
    # the other's scan (ADVICE r2)
    pid_tag = f"{sf_tag}_p{os.getpid()}"
    ot, lt = f"orders_bkt_{pid_tag}", f"lineitem_bkt_{pid_tag}"
    # overwrite every run: a stale table must never poison correctness
    # (the write IS the operator's point — it's the amortized shuffle).
    # Warehouse dirs outlive the per-session metastore, so clear both.
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in (ot, lt):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    # reap bucketed dirs left by DEAD processes (each pid creates its own
    # pair; without a sweep the warehouse grows by two fact-table copies
    # per bench/pytest run forever). Live pids are left alone — that is
    # exactly the race the pid suffix exists to avoid.
    import glob as _glob

    for d in _glob.glob(f"{warehouse}/*_bkt_{sf_tag}_p*"):
        try:
            stale_pid = int(d.rsplit("_p", 1)[-1])
            os.kill(stale_pid, 0)  # raises if no such process
        except ValueError:
            continue
        except OSError:
            spark.sql(f"DROP TABLE IF EXISTS {os.path.basename(d)}")
            shutil.rmtree(d, ignore_errors=True)
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ot)
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(lt)
    ob, lb = spark.table(ot), spark.table(lt)
    return (
        ob.hint("merge")
        .join(lb.hint("merge"), ob.o_orderkey == lb.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "salted_join_orders_lineitem",
    oracle="""
    SELECT o.o_orderpriority,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def salted_join_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALTED fact-fact join (M5 skew hygiene): the probe side gets a
    row-level deterministic salt (hash of the full row key, NOT the join
    key — same-key rows must spread), the build side replicates once per
    salt, and the join key becomes (orderkey, salt) — a hot orderkey's
    rows now land on N_SALTS reducers instead of one. Same result as the
    unsalted join by construction (each probe row matches exactly the
    one replica carrying its salt), which the shared oracle proves.
    Salting trades N× build-side duplication for bounded per-task skew;
    at 100 TB you apply it only when AQE's skew splitting isn't enough
    (e.g. a single key larger than an executor)."""
    n_salts = 4
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_salts))
    )
    orders_rep = orders.withColumn(
        "salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    return (
        orders_rep.join(
            li,
            (orders_rep.o_orderkey == li.l_orderkey) & (orders_rep.salt == li.salt),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "bloom_runtime_filter_join",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderpriority
    """,
)
def bloom_runtime_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter pruned join (Catalyst's InjectRuntimeFilter):
    a selective dimension-side predicate is turned into a bloom filter
    that prunes the FACT side's shuffle — at 100 TB, the ~96% of
    lineitem rows whose order is not URGENT are dropped at the scan's
    Filter instead of being shuffled and discarded by the join.

    This plan is Spark's DEFAULT at production scale
    (``runtime.bloomFilter.enabled`` is true; only the 10 GB
    application-side-scan threshold keeps it out of toy plans — any
    real lineitem dwarfs that). The builder scopes that one threshold
    down while forcing optimization so the 100 TB plan materializes at
    test scale, then restores it so no other catalog entry is affected;
    the already-optimized plan stays cached on this DataFrame's
    QueryExecution. Semantics are threshold-independent — the bloom is
    a may-contain pre-filter and the join stays exact, which the shared
    oracle proves. A plan gate pins ``might_contain`` +
    ``bloom_filter_agg`` (tests/test_plan_quality.py)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )
    app_thr = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    bcast_thr = "spark.sql.autoBroadcastJoinThreshold"
    old_app, old_bcast = spark.conf.get(app_thr), spark.conf.get(bcast_thr)
    spark.conf.set(app_thr, "1KB")
    spark.conf.set(bcast_thr, "-1")  # tiny test dims would broadcast, hiding the shuffle this prunes
    try:
        out._jdf.queryExecution().executedPlan()  # pin the scaled-up plan
    finally:
        spark.conf.set(app_thr, old_app)
        spark.conf.set(bcast_thr, old_bcast)
    return out




def _scratch_dir(prefix: str, sf_dir: str) -> str:
    """Per-process scratch path for sink round-trip queries: the pid
    suffix keeps concurrent bench/pytest sessions from overwriting each
    other's dir mid-scan (ADVICE r2 race class), and dirs left by DEAD
    pids are reaped here so repeated runs don't accumulate in tempdir.
    Live pids' dirs are untouched — that's the race the suffix avoids."""
    import glob
    import hashlib
    import shutil
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = tempfile.gettempdir()
    for d in glob.glob(os.path.join(base, f"{prefix}_{tag}_p*")):
        try:
            stale = int(d.rsplit("_p", 1)[-1])
            os.kill(stale, 0)
        except ValueError:
            continue
        except OSError:
            shutil.rmtree(d, ignore_errors=True)
    return os.path.join(base, f"{prefix}_{tag}_p{os.getpid()}")


# --------------------------------------------------------------------------
@register(
    "jsonl_sink_roundtrip",
    oracle="""
    SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
)
def jsonl_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source round trip — the interchange format of
    every data-curation handoff. Written distributed (no coalesce), read
    back with an EXPLICIT schema (inference is a full extra scan at
    100 TB), then aggregated; equality with the direct oracle proves the
    round trip lossless."""
    docs = load_table(spark, sf_dir, "documents")
    out = _scratch_dir("itwiki_jsonl_sink", sf_dir)
    docs.select("doc_id", "lang", "n_chars").write.mode("overwrite").json(out)
    back = spark.read.schema("doc_id long, lang string, n_chars long").json(out)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


# --------------------------------------------------------------------------
@register(
    "semi_join_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI — EXISTS without materializing the right side's columns
    (and no row multiplication, unlike join+distinct)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
@register(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    """,
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI — NOT EXISTS as a join operator. The right side is
    filtered to big-ticket orders: every customer has SOME order in the
    testdata, so the unfiltered anti-join is empty at every sf and the
    parity check would pass vacuously."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
@register(
    "window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — rank inside a hash-partitioned window;
    Spark pushes a per-partition rank limit below the exchange
    (WindowGroupLimit) so the shuffle carries ≤k rows per key."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# --------------------------------------------------------------------------
@register(
    "window_running_sum",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_value
    FROM events
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user total over event time — the analytic-frame shape.
    Deterministic tiebreak (ts, event_id) makes the prefix sums
    bit-reproducible across engines."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 2).alias("running_value")
    )


# --------------------------------------------------------------------------
@register(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: TakeOrderedAndProject (per-partition heaps + driver
    merge of k×partitions rows) — never a total sort."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
@register(
    "set_except",
    oracle="""
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with finished but no open orders (EXCEPT DISTINCT).
    Chosen over the customer-vs-supplier nationkey variant because that
    set is empty at sf>=0.01 — a vacuous parity check."""
    orders = load_table(spark, sf_dir, "orders")
    fin = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    opn = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return fin.subtract(opn)  # EXCEPT DISTINCT


# --------------------------------------------------------------------------
@register(
    "set_intersect",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


# --------------------------------------------------------------------------
@register(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.union(supp).distinct()


# --------------------------------------------------------------------------
@register(
    "time_bucket_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
           event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def time_bucket_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup of the event stream (batch twin of the streaming
    windowed agg in streaming/events.py). Bucket emitted as a string so
    the oracle compare is timezone-proof."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_bucket"
            ),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


# --------------------------------------------------------------------------
@register(
    "json_extract_props",
    oracle="""
    SELECT CAST(floor(CAST(json_extract_string(props, '$.k') AS INTEGER) / 10) AS BIGINT)
             AS k_decile,
           count(*) AS n, round(avg(value), 4) AS avg_value
    FROM events
    GROUP BY 1
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props (JSON string → typed column) — the events
    table's MapType-ish access path (SURVEY.md §1 north-star types)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.select(F.floor(k / 10).cast("long").alias("k_decile"), "value")
        .groupBy("k_decile")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )


# --------------------------------------------------------------------------
@register(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets family (ROLLUP): subtotal + grand-total rows with
    NULL group keys, one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


# --------------------------------------------------------------------------
@register(
    "pivot_linestatus",
    oracle="""
    SELECT l_returnflag,
           round(coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0), 2) AS qty_f,
           round(coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0), 2) AS qty_o
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no discovery scan — at scale,
    always pin pivot values)."""
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity"))
    )
    return piv.select(
        "l_returnflag",
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_f"),
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_o"),
    )


# --------------------------------------------------------------------------
@register(
    "asof_join_last_click",
    oracle="""
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           strftime(last_click_ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
    FROM (
      SELECT event_id, user_id, ts, event_type,
             max(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
      FROM events)
    WHERE event_type = 'purchase'
    """,
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (Spark has no native one, SURVEY.md §2 'custom
    operators'): each purchase matched to the latest STRICTLY-PRIOR click
    of the same user, via a conditional running max — one shuffle on
    user_id, no pd.merge_asof/UDF needed, scales as a window."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        events.withColumn(
            "last_click_ts",
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", fmt).alias("purchase_ts"),
            F.date_format("last_click_ts", fmt).alias("click_ts"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "asof_join_cogrouped",
    oracle="""
    SELECT event_id, user_id, us AS purchase_us, last_click_us FROM (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
             CAST(max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT)
               AS last_click_us
      FROM events)
    WHERE event_type = 'purchase'
    """,
)
def asof_join_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF via COGROUPED applyInPandas: purchases and clicks cogrouped
    per user, matched with ``pd.merge_asof`` (backward, strict) — the
    two-sided Arrow shape for as-of logic that outgrows window
    expressions (tolerances, nearest-forward, multi-column quotes).
    Strictly-less-than on the microsecond timestamp; the oracle's RANGE
    frame with a 1 µs offset expresses the same strictness. One shuffle
    per side on user_id."""
    import pandas as pd

    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", us.alias("us")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", us.alias("click_us")
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                {"event_id": [], "user_id": [], "purchase_us": [], "last_click_us": []}
            )
        left = left.sort_values("us")
        right = right.sort_values("click_us")
        out = pd.merge_asof(
            left,
            right[["click_us"]],
            left_on="us",
            right_on="click_us",
            direction="backward",
            allow_exact_matches=False,
        )
        return pd.DataFrame(
            {
                "event_id": out["event_id"],
                "user_id": out["user_id"],
                "purchase_us": out["us"],
                "last_click_us": out["click_us"],
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            merge,
            "event_id long, user_id long, purchase_us long, last_click_us long",
        )
    )


# --------------------------------------------------------------------------
@register(
    "sessionize",
    oracle="""
    SELECT event_id, user_id, CAST(session_id AS BIGINT) AS session_id FROM (
      SELECT event_id, user_id,
             sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM (
        SELECT event_id, user_id, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                 AS prev_us
        FROM events))
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-min inactivity gap: lag + cumulative sum of
    session-break flags. Integer microsecond arithmetic on both engines —
    exact parity, no float time math."""
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w_order = Window.partitionBy("user_id").orderBy(us, F.col("event_id"))
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(us).over(w_order)
    is_break = F.when(prev.isNull() | ((us - prev) > 1_800_000_000), 1).otherwise(0)
    return events.select(
        "event_id",
        "user_id",
        F.sum(is_break).over(w_run).cast("long").alias("session_id"),
    )


# --------------------------------------------------------------------------
@register(
    "cube_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping combinations in one pass (vs rollup's k+1)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
@register(
    "approx_distinct_bounds",
    # the oracle states the CONTRACT: exact counts plus the claim that
    # the HLL estimate lands within 5% — if Spark's sketch ever drifts
    # out of bounds, the hash mismatch flags a real quality regression
    oracle="""
    SELECT o_orderpriority, count(DISTINCT o_custkey) AS exact_cust,
           true AS hll_within_5pct
    FROM orders GROUP BY o_orderpriority
    """,
)
def approx_distinct_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) alongside its exact twin,
    emitting the error-bound verdict — the scale substitute for
    COUNT(DISTINCT) (sketches merge map-side; no expand+double-agg).
    The oracle pins the ≤5% contract, so this approximate operator is
    still a hash-checked catalog row."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_cust"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("hll"),
    )
    return agg.select(
        "o_orderpriority",
        "exact_cust",
        (
            F.abs(F.col("hll") - F.col("exact_cust"))
            <= 0.05 * F.col("exact_cust")
        ).alias("hll_within_5pct"),
    )


# --------------------------------------------------------------------------
@register(
    "approx_percentile_bounds",
    oracle="""
    SELECT event_type, round(quantile_cont(value, 0.5), 4) AS exact_p50,
           true AS approx_within_5pct
    FROM events GROUP BY event_type
    """,
)
def approx_percentile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile next to the exact interpolated median, with the
    ±5%-of-spread contract as the checked claim — the per-group-sort-free
    percentile for 100 TB."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("exact_p50"),
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("ap50"),
        (F.max("value") - F.min("value")).alias("spread"),
    )
    return agg.select(
        "event_type",
        "exact_p50",
        (F.abs(F.col("ap50") - F.col("exact_p50")) <= 0.05 * F.col("spread")).alias(
            "approx_within_5pct"
        ),
    )


# --------------------------------------------------------------------------
@register(
    "countmin_heavy_hitters",
    # the sketch uses a deterministic universal-hash family
    # (md5 → 15-hex-char int, the engine-portable recipe the minhash
    # family uses), so the ESTIMATES THEMSELVES hash-match the oracle —
    # stronger than an error-contract check
    oracle="""
    WITH exact AS (
      SELECT user_id, count(*) AS exact_n FROM events GROUP BY user_id
    ),
    probes AS (
      SELECT user_id, exact_n FROM exact
      ORDER BY exact_n DESC, user_id LIMIT 10
    ),
    sketch AS (
      SELECT j.j,
             ('0x' || substr(md5(j.j::VARCHAR || ':' || e.user_id::VARCHAR),
                             1, 15))::BIGINT % 512 AS bucket,
             count(*) AS c
      FROM events e CROSS JOIN range(0, 4) j(j)
      GROUP BY 1, 2
    )
    SELECT p.user_id, p.exact_n, min(s.c) AS cms_estimate,
           min(s.c) >= p.exact_n AS never_underestimates
    FROM probes p
    CROSS JOIN range(0, 4) j(j)
    JOIN sketch s
      ON s.j = j.j
     AND s.bucket = ('0x' || substr(md5(j.j::VARCHAR || ':'
                                        || p.user_id::VARCHAR),
                                    1, 15))::BIGINT % 512
    GROUP BY 1, 2
    """,
)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=4 rows × w=512 buckets) probed for the top-10
    heavy hitters, next to their exact counts — the frequency-sketch
    companion to the HLL (distinct) and KLL-style (percentile) entries,
    and the standard heavy-hitter pass of a training-data curation
    pipeline (boilerplate/spam keys, per-user caps).

    100 TB shape: the sketch is an explode(d) → groupBy(row, bucket)
    count — whole-stage codegen end to end, partial-aggregated map-side
    to ≤ d×w rows per task, so the sketch-build shuffle carries at most
    d×w×tasks rows no matter the input size (THE point of a sketch).
    The probe side is a broadcast of 10×d cells against the d×w-row
    sketch; min-over-rows gives the classic never-underestimating
    CMS bound, which the result column pins as a checked claim."""
    d_rows, w_buckets = 4, 512
    events = load_table(spark, sf_dir, "events").select("user_id")

    def bucket(j_col, key_col):
        cell = F.concat_ws(":", j_col.cast("string"), key_col.cast("string"))
        return (
            F.conv(F.substring(F.md5(cell), 1, 15), 16, 10).cast("long")
            % w_buckets
        )

    j_explode = F.explode(F.array(*[F.lit(j) for j in range(d_rows)])).alias("j")
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = exact.orderBy(F.col("exact_n").desc(), "user_id").limit(10)
    sketch = (
        events.select("user_id", j_explode)
        .select("j", bucket(F.col("j"), F.col("user_id")).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probe_cells = probes.select("user_id", "exact_n", j_explode).withColumn(
        "bucket", bucket(F.col("j"), F.col("user_id"))
    )
    return (
        sketch.join(F.broadcast(probe_cells), ["j", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("c").alias("cms_estimate"))
        .select(
            "user_id",
            "exact_n",
            "cms_estimate",
            (F.col("cms_estimate") >= F.col("exact_n")).alias("never_underestimates"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "partitioned_events_prune",
    oracle="""
    SELECT user_id, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
)
def partitioned_events_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned layout end-to-end: events written
    partitionBy(event_type), then a type-filtered aggregate reads ONE
    directory of five — the scan shows PartitionFilters, not a data
    filter (plan gate in tests/test_plan_quality.py). The directory
    layout is the coarse index of a 100 TB lake; pruning happens at
    planning time, before any I/O."""
    events = load_table(spark, sf_dir, "events")
    out = _scratch_dir("itwiki_events_part", sf_dir)
    events.withColumn("etype", F.col("event_type")).write.partitionBy("etype").mode(
        "overwrite"
    ).parquet(out)
    back = spark.read.parquet(out).filter(F.col("etype") == "purchase")
    return back.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value")
    )


# --------------------------------------------------------------------------
@register(
    "funnel_analysis",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
      GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM s1) AS n_signup,
           (SELECT count(*) FROM s2) AS n_then_click,
           (SELECT count(*) FROM s3) AS n_then_purchase
    """,
)
def funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup → later click → later purchase): each
    stage is a conditional-min aggregate joined forward, so step order
    is enforced by time, not mere event presence. Three shuffles on
    user_id with exchange reuse — the product-analytics staple."""
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    s1 = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(us).alias("t1"))
    )
    s2 = (
        events.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(us > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min(us).alias("t2"))
    )
    s3 = (
        events.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(us > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min(us).alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_then_click")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_then_purchase")))
    )


# --------------------------------------------------------------------------
@register(
    "cohort_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events)
    SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', f.cohort_week::DATE, a.week::DATE) // 7 AS BIGINT)
             AS week_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM first f JOIN activity a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    counted in every later active week — the (cohort × offset)
    triangle every growth dashboard draws. Week truncation is ISO
    Monday-based in both engines; offsets are integer day arithmetic."""
    events = load_table(spark, sf_dir, "events")
    first = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    return (
        first.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(
                F.datediff(F.col("week").cast("date"), F.col("cohort_week").cast("date"))
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# --------------------------------------------------------------------------
@register(
    "scd2_segment_upsert",
    oracle="""
    SELECT c_custkey, c_mktsegment, version, is_current FROM (
      SELECT c_custkey, c_mktsegment, 1 AS version,
             NOT (c_acctbal > 5000) AS is_current
      FROM customer
      UNION ALL
      SELECT c_custkey, 'PREMIUM', 2, true
      FROM customer WHERE c_acctbal > 5000)
    """,
)
def scd2_segment_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert semantics without a table format: a slowly-changing
    dimension type-2 update — changed keys close their version-1 row
    (is_current=false) and append a version-2 row — expressed as a
    declarative union. This is what Delta/Iceberg MERGE INTO compiles
    to; on plain parquet you rewrite the dimension this way and swap
    directories atomically."""
    cust = load_table(spark, sf_dir, "customer")
    changed = F.col("c_acctbal") > 5000
    v1 = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit(1).alias("version"),
        (~changed).alias("is_current"),
    )
    v2 = cust.filter(changed).select(
        "c_custkey",
        F.lit("PREMIUM").alias("c_mktsegment"),
        F.lit(2).alias("version"),
        F.lit(True).alias("is_current"),
    )
    return v1.unionAll(v2)


# --------------------------------------------------------------------------
@register(
    "error_safe_functions",
    oracle="""
    SELECT c_custkey,
           TRY_CAST(c_name AS INTEGER) AS name_as_int,
           TRY_CAST(CAST(c_custkey AS VARCHAR) AS INTEGER) AS key_roundtrip,
           round(c_acctbal / nullif(c_custkey % 3, 0), 4) AS risky_div
    FROM customer
    """,
)
def error_safe_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar battery (try_cast / try_divide): malformed input
    and zero divisors yield NULL instead of failing the job — at 100 TB
    a single dirty row must never kill a 1000-executor stage. (Spark 4
    runs ANSI mode by default, so the non-try forms THROW; the try_*
    family is the production idiom.)"""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.col("c_name").try_cast("int").alias("name_as_int"),
        F.col("c_custkey").cast("string").try_cast("int").alias("key_roundtrip"),
        F.round(
            F.try_divide(F.col("c_acctbal"), F.col("c_custkey") % 3), 4
        ).alias("risky_div"),
    )


# --------------------------------------------------------------------------
@register(
    "date_spine_gapfill",
    oracle="""
    SELECT strftime(d, '%Y-%m-%d') AS day, coalesce(n, 0) AS n_orders
    FROM (SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-03-31',
                                        INTERVAL 1 DAY)) AS d) spine
    LEFT JOIN (SELECT o_orderdate::DATE AS od, count(*) AS n
               FROM orders GROUP BY 1) o
      ON spine.d = o.od
    """,
)
def date_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling over a generated date spine: sequence() builds the
    calendar, a left join pins zero rows for empty days — the
    time-series idiom reports need (missing days must EXIST as zeros,
    not be absent). The spine is generated, not scanned: one literal
    row exploded, no source table."""
    orders = load_table(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-03-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d")
    )
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("od")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return spine.join(daily, spine.d == daily.od, "left").select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
    )


# --------------------------------------------------------------------------
@register(
    "schema_evolution_merge",
    oracle="""
    SELECT count(*) AS n_rows,
           count(o_totalprice) AS n_price,
           count(o_orderpriority) AS n_prio
    FROM (
      SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority FROM orders
      UNION ALL
      SELECT o_orderkey, NULL, o_orderpriority FROM orders)
    """,
)
def schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on the lake: two parquet generations with
    different column sets read back through mergeSchema — old files
    null-pad the new column and vice versa. The counts prove which rows
    carry which columns. (mergeSchema costs a footer scan per file; at
    100 TB pin the unified schema explicitly instead.)"""
    orders = load_table(spark, sf_dir, "orders")
    out = _scratch_dir("itwiki_schema_evo", sf_dir)
    orders.select("o_orderkey", "o_totalprice").write.mode("overwrite").parquet(
        f"{out}/gen=1"
    )
    orders.select("o_orderkey", "o_orderpriority").write.mode("overwrite").parquet(
        f"{out}/gen=2"
    )
    back = spark.read.option("mergeSchema", True).parquet(f"{out}/gen=1", f"{out}/gen=2")
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_totalprice").alias("n_price"),
        F.count("o_orderpriority").alias("n_prio"),
    )


# --------------------------------------------------------------------------
@register(
    "rank_battery",
    oracle="""
    SELECT event_id, user_id,
           CAST(dense_rank() OVER w AS BIGINT) AS drank,
           round(percent_rank() OVER w, 6) AS prank,
           round(cume_dist() OVER w, 6) AS cdist
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    """,
)
def rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function battery (dense_rank / percent_rank / cume_dist) —
    the distribution-position windows that complete row_number/ntile
    elsewhere in the catalog."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return events.select(
        "event_id",
        "user_id",
        F.dense_rank().over(w).cast("long").alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


# --------------------------------------------------------------------------
@register(
    "except_all_suppkeys",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_quantity > 25
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_quantity > 40
    """,
)
def except_all_suppkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (each right occurrence cancels
    ONE left occurrence; the DISTINCT variant is `set_except`)."""
    li = load_table(spark, sf_dir, "lineitem")
    hi = li.filter(F.col("l_quantity") > 25).select("l_suppkey")
    vhi = li.filter(F.col("l_quantity") > 40).select("l_suppkey")
    return hi.exceptAll(vhi)


# --------------------------------------------------------------------------
@register(
    "intersect_all_suppkeys",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_quantity > 25
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_discount > 0.05
    """,
)
def intersect_all_suppkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection (min of the two
    multiplicities per value)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 25).select("l_suppkey")
    b = li.filter(F.col("l_discount") > 0.05).select("l_suppkey")
    return a.intersectAll(b)


# --------------------------------------------------------------------------
@register(
    "explode_outer_matches",
    oracle="""
    SELECT doc_id, unnest(
             CASE WHEN len(regexp_extract_all(text, '(data|key)[a-z]*')) = 0
                  THEN [NULL]
                  ELSE regexp_extract_all(text, '(data|key)[a-z]*') END) AS m
    FROM documents
    """,
)
def explode_outer_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with NO matches survive as (doc_id, NULL)
    instead of vanishing — the left-join flavor of flattening, essential
    when downstream joins must not silently drop unmatched parents."""
    docs = load_table(spark, sf_dir, "documents")
    matches = F.regexp_extract_all(F.col("text"), F.lit("(data|key)[a-z]*"), 0)
    return docs.select("doc_id", F.explode_outer(matches).alias("m"))


# --------------------------------------------------------------------------
@register(
    "stats_aggregates",
    oracle="""
    SELECT event_type,
           round(corr(value, CAST(json_extract_string(props, '$.k') AS INTEGER)), 6)
             AS corr_vk,
           round(covar_samp(value, CAST(json_extract_string(props, '$.k') AS INTEGER)), 4)
             AS covar_vk,
           round(stddev_samp(value), 6) AS sd,
           round(var_samp(value), 4) AS var
    FROM events GROUP BY event_type
    """,
)
def stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate battery (corr/covar/stddev/variance) — the
    profiling pass of a feature-engineering pipeline; all single-pass
    algebraic aggregates (Catalyst plans partial+final, shuffle carries
    one moment-tuple per group per partition)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return events.groupBy("event_type").agg(
        F.round(F.corr("value", k), 6).alias("corr_vk"),
        F.round(F.covar_samp("value", k), 4).alias("covar_vk"),
        F.round(F.stddev_samp("value"), 6).alias("sd"),
        F.round(F.var_samp("value"), 4).alias("var"),
    )


# --------------------------------------------------------------------------
@register(
    "array_hof_battery",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), t -> strlen(t) >= 6)) AS INTEGER)
             AS n_long,
           CAST(list_sum(list_transform(string_split(text, ' '), t -> strlen(t))) AS BIGINT)
             AS sum_len,
           CAST(list_max(list_transform(string_split(text, ' '), t -> strlen(t))) AS INTEGER)
             AS max_len,
           list_contains(string_split(text, ' '), 'data') AS has_data
    FROM documents
    """,
)
def array_hof_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order-function battery (filter/transform/aggregate/
    array_max/array_contains) over token arrays — the collection-API
    surface. NB HOF lambdas evaluate interpreted (outside codegen); for
    CPU-bound hot paths restructure as explode→agg (see
    operators/dedup.py) — this entry pins SEMANTICS of the API."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")

    def is_long(t):
        return F.length(t) >= 6

    def tok_len(t):
        return F.length(t)

    lens = F.transform(toks, tok_len)
    return docs.select(
        "doc_id",
        F.size(F.filter(toks, is_long)).alias("n_long"),
        F.aggregate(
            lens, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
        ).alias("sum_len"),
        F.array_max(lens).alias("max_len"),
        F.array_contains(toks, "data").alias("has_data"),
    )


# --------------------------------------------------------------------------
@register(
    "cube_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with grouping_id(): the bitmask that tells subtotal levels
    apart — how consumers distinguish 'NULL because aggregated' from
    'NULL in the data' (both engines use the same bit convention)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"), F.count(F.lit(1)).alias("n")
    )


# --------------------------------------------------------------------------
@register(
    "grouping_sets_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (SURVEY.md §3: SQL and
    DataFrame produce the same Catalyst plan; this entry exercises the
    SQL path end-to-end)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


# --------------------------------------------------------------------------
@register(
    "distinct_counts",
    oracle="""
    SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — planned as expand + two-phase aggregate; the
    exact-distinct sibling of approx_count_distinct (which has no
    cross-engine oracle and belongs in bench-only contexts)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"), F.count(F.lit(1)).alias("n_orders")
    )


# --------------------------------------------------------------------------
@register(
    "percentile_stats",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90
    FROM events GROUP BY event_type
    """,
)
def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (linear interpolation — same definition as
    quantile_cont). At 100 TB swap to approx_percentile and drop the
    oracle to rows-only; exact percentile requires a per-group sort."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
    )


# --------------------------------------------------------------------------
@register(
    "unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide measures → (measure, val) rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "measure",
        "val",
    )


# --------------------------------------------------------------------------
@register(
    "range_join_event_pairs",
    oracle="""
    SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
           (epoch_us(b.ts) - epoch_us(a.ts)) / 1000000.0 AS delta_sec
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND (epoch_us(a.ts) < epoch_us(b.ts)
          OR (epoch_us(a.ts) = epoch_us(b.ts) AND a.event_id < b.event_id))
     AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000
    """,
)
def range_join_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE JOIN: same-user event pairs ≤5 min apart, via the bucketized
    equi-join in operators/rangejoin.py (provably equal to the cartesian
    θ-join the oracle runs, at Σ bucket² cost instead of n²)."""
    from ..operators.rangejoin import events_within_window

    return events_within_window(load_table(spark, sf_dir, "events"), window_sec=300)


# --------------------------------------------------------------------------
@register(
    "collect_set_agg",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def collect_set_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-building aggregate; sort_array makes the set deterministic and
    array_join serializes it to a scalar string — every registered query's
    output columns must be scalar (the driver harness canonicalizes results
    through a pandas lexsort that cannot hash list/dict cells)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.array_join(
            F.sort_array(F.collect_set("o_orderstatus")), ","
        ).alias("statuses"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
@register(
    "string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS up, lower(c_mktsegment) AS lo,
           CAST(strlen(c_name) AS INTEGER) AS len,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
           reverse(c_mktsegment) AS rev,
           CAST(levenshtein(c_mktsegment, 'BUILDING') AS INTEGER) AS lev,
           substr(c_name, 1, 8) AS pre,
           replace(c_name, '#', '-') AS repl,
           concat_ws('/', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS joined
    FROM customer
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function battery (the reference's only scalar surface
    is O4–O6; this is the completion)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.length("c_name").alias("len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.reverse("c_mktsegment").alias("rev"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("lev"),
        F.substring("c_name", 1, 8).alias("pre"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("repl"),
        F.concat_ws("/", "c_mktsegment", F.col("c_nationkey").cast("string")).alias("joined"),
    )


# --------------------------------------------------------------------------
@register(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           CAST(dayofmonth(o_orderdate) AS INTEGER) AS d,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS INTEGER) AS days_since
    FROM orders
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar battery over the timestamp column."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.quarter(d).alias("q"),
        F.date_format(d + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("plus30"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since"),
    )


# --------------------------------------------------------------------------
@register(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 6) AS ab,
           CAST(ceil(l_quantity) AS BIGINT) AS ce,
           CAST(floor(l_extendedprice) AS BIGINT) AS fl,
           round(sqrt(l_quantity), 6) AS sq,
           round(ln(l_extendedprice), 6) AS lg,
           round(pow(1.0 + l_tax, 2), 6) AS pw,
           CAST(l_partkey % 97 AS BIGINT) AS md
    FROM lineitem
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar battery; all rounded — libm-level doubles are the one
    place engines may differ in the last ulp."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("ab"),
        F.ceil("l_quantity").alias("ce"),
        F.floor("l_extendedprice").alias("fl"),
        F.round(F.sqrt("l_quantity"), 6).alias("sq"),
        F.round(F.log("l_extendedprice"), 6).alias("lg"),
        F.round(F.pow(F.lit(1.0) + F.col("l_tax"), 2), 6).alias("pw"),
        (F.col("l_partkey") % 97).alias("md"),
    )


# --------------------------------------------------------------------------
@register(
    "scalar_subquery_filter",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """,
)
def scalar_subquery_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (SQL API; Catalyst plans the inner
    agg once and broadcasts the scalar)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)"
    )


# --------------------------------------------------------------------------
@register(
    "window_navigation",
    oracle="""
    SELECT event_id, user_id,
           lag(event_id) OVER w AS prev_event,
           lead(event_id) OVER w AS next_event,
           first_value(event_id) OVER w AS first_event,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation window functions (lag/lead/first_value/ntile)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        F.first("event_id").over(wf).alias("first_event"),
        F.ntile(4).over(w).alias("quartile"),
    )


# --------------------------------------------------------------------------
@register(
    "hll_sketch_union",
    oracle="""
    SELECT count(DISTINCT o_custkey) AS exact_total, true AS union_within_5pct
    FROM orders
    """,
)
def hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSketches HLL with UNION — the reusable-sketch workflow that
    approx_count_distinct cannot do: build one sketch per priority
    stratum (in practice: per day/shard, persisted), then merge the
    BINARY sketches and estimate the global cardinality without
    re-scanning. Contract oracle: the union estimate lands within 5% of
    the exact global distinct."""
    orders = load_table(spark, sf_dir, "orders")
    per_stratum = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = per_stratum.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = orders.agg(F.countDistinct("o_custkey").alias("exact_total"))
    return exact.crossJoin(F.broadcast(merged)).select(
        "exact_total",
        (
            F.abs(F.col("est") - F.col("exact_total"))
            <= 0.05 * F.col("exact_total")
        ).alias("union_within_5pct"),
    )


# --------------------------------------------------------------------------
@register(
    "listagg_ordered",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
    FROM orders GROUP BY o_orderpriority
    """,
)
def listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg WITHIN GROUP (Spark 4) — ordered string aggregation, the
    SQL-standard sibling of collect_set+concat; the explicit ORDER BY
    makes the concatenation deterministic and hashable."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_la")
    return spark.sql(
        """
        SELECT o_orderpriority,
               listagg(DISTINCT o_orderstatus, ',')
                 WITHIN GROUP (ORDER BY o_orderstatus) AS statuses
        FROM orders_la GROUP BY o_orderpriority
        """
    )


# --------------------------------------------------------------------------
@register(
    "bitmap_distinct_count",
    oracle="""
    SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust
    FROM orders GROUP BY o_orderpriority
    """,
)
def bitmap_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregates (Spark 3.5+):
    positions OR-ed into fixed 4 KB bucket bitmaps map-side, counted and
    summed — same answer as COUNT(DISTINCT) (the shared oracle), but the
    shuffle carries one bitmap per (group, bucket) instead of every
    distinct value, and bitmaps merge associatively across any
    partitioning. The mergeable-exact-sketch pattern HLL approximates."""
    orders = load_table(spark, sf_dir, "orders")
    per_bucket = orders.groupBy(
        "o_orderpriority", F.expr("bitmap_bucket_number(o_custkey)").alias("bucket")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias("bm"))
    return (
        per_bucket.groupBy("o_orderpriority")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_cust"))
    )


# --------------------------------------------------------------------------
@register(
    "sentences_tokenize",
    oracle="""
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
           string_split(text, ' ')[1] AS first_word
    FROM documents
    """,
)
def sentences_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Locale-aware tokenization via ``sentences()`` (ICU-style break
    iteration — the linguistically-correct tokenizer Spark ships). On
    this punctuation-free corpus it provably equals whitespace
    splitting, which is what the oracle checks; on real text it handles
    abbreviations and CJK where split(' ') cannot."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.flatten(F.sentences(F.col("text")))
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        words[0].alias("first_word"),
    )


# --------------------------------------------------------------------------
@register(
    "variant_extract",
    oracle="""
    SELECT CAST(floor(CAST(json_extract_string(props, '$.k') AS INTEGER) / 10) AS BIGINT)
             AS k_decile,
           count(*) AS n, round(avg(value), 4) AS avg_value
    FROM events
    GROUP BY 1
    """,
)
def variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's VARIANT type: parse_json → open binary-JSON column,
    typed access via variant_get — the shredding-friendly successor to
    get_json_object string probing (same answer as json_extract_props,
    different engine path: variant parses once and stores a binary
    tree, not a string re-parsed per access)."""
    events = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        events.select(F.floor(k / 10).cast("long").alias("k_decile"), "value")
        .groupBy("k_decile")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )


# --------------------------------------------------------------------------
@register(
    "null_semantics_battery",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'O') AS maybe_status,
           (nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM
            nullif(o_orderstatus, 'O')) AS nullsafe_self,
           (nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F') AS nullsafe_f,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS filled,
           CASE WHEN nullif(o_orderstatus, 'O') IS NULL
                THEN 'was_null' ELSE 'had_value' END AS nvl2_like
    FROM orders
    """,
)
def null_semantics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics battery: nullif to MAKE nulls, null-safe equality
    (<=> / IS NOT DISTINCT FROM — true for NULL vs NULL where = yields
    NULL), coalesce fill, and the nvl2 branch shape. Three-valued logic
    is where naive filter rewrites silently drop rows at scale."""
    orders = load_table(spark, sf_dir, "orders")
    maybe = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return orders.select(
        "o_orderkey",
        maybe.alias("maybe_status"),
        maybe.eqNullSafe(maybe).alias("nullsafe_self"),
        maybe.eqNullSafe(F.lit("F")).alias("nullsafe_f"),
        F.coalesce(maybe, F.lit("open")).alias("filled"),
        F.when(maybe.isNull(), F.lit("was_null"))
        .otherwise(F.lit("had_value"))
        .alias("nvl2_like"),
    )


# --------------------------------------------------------------------------
@register(
    "window_offset_battery",
    oracle="""
    SELECT event_id, user_id,
           lag(event_id, 2, -1) OVER w AS lag2,
           round(lead(click_value IGNORE NULLS) OVER w, 2) AS next_click_value,
           nth_value(event_id, 3) OVER (PARTITION BY user_id
                                        ORDER BY epoch_us(ts), event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND CURRENT ROW) AS third_event
    FROM (SELECT event_id, user_id, ts,
                 CASE WHEN event_type = 'click' THEN value END AS click_value
          FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    """,
)
def window_offset_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-window battery: lag with offset+default, lead IGNORE NULLS
    (next click's value, skipping non-clicks), nth_value — via the SQL
    API (IGNORE NULLS has no PySpark function form)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_wob")
    return spark.sql(
        """
        SELECT event_id, user_id,
               lag(event_id, 2, -1) OVER w AS lag2,
               round(lead(click_value) IGNORE NULLS OVER w, 2) AS next_click_value,
               nth_value(event_id, 3) OVER (PARTITION BY user_id
                                            ORDER BY unix_micros(ts), event_id
                                            ROWS BETWEEN UNBOUNDED PRECEDING
                                                     AND CURRENT ROW) AS third_event
        FROM (SELECT event_id, user_id, ts,
                     CASE WHEN event_type = 'click' THEN value END AS click_value
              FROM events_wob)
        WINDOW w AS (PARTITION BY user_id ORDER BY unix_micros(ts), event_id)
        """
    )


# --------------------------------------------------------------------------
@register(
    "regex_capture_groups",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '#(0*)([1-9][0-9]*)', 2) AS id_digits,
           CAST(strlen(regexp_extract(c_name, '#(0*)([1-9][0-9]*)', 1)) AS INTEGER)
             AS n_leading_zeros
    FROM customer
    """,
)
def regex_capture_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex CAPTURE-GROUP extraction (group index, not whole-match) —
    the structured-field parser for semi-structured strings."""
    cust = load_table(spark, sf_dir, "customer")
    pat = "#(0*)([1-9][0-9]*)"
    return cust.select(
        "c_custkey",
        F.regexp_extract(F.col("c_name"), pat, 2).alias("id_digits"),
        F.length(F.regexp_extract(F.col("c_name"), pat, 1)).alias("n_leading_zeros"),
    )


# --------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → 3-way join → agg → top-k.
    Catalyst pushes both date filters into the scans and broadcasts the
    filtered customer side; top-k is TakeOrdered, never a full sort."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a cross-table equality
    (customer.nation == supplier.nation) — the join-reordering stress
    test. nation/region are constant-size → unconditional broadcast;
    supplier only LOOKS like a dim (it scales with SF, ~700 M rows at
    100 TB) so its hint is size-gated (broadcast_if_small)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(
            broadcast_if_small(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
@register(
    "session_window_agg",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, epoch_us(ts) AS us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
    sess AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY us
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE gap-based session operator (F.session_window) —
    the built-in twin of the lag/cumsum `sessionize` query. Boundary
    convention: a session window spans [event, event + gap), so a
    follow-up landing EXACTLY gap later does not overlap — gap >= 30 min
    starts a new session, which the oracle's `>=` break mirrors.
    Works unchanged in Structured Streaming."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
@register(
    "orc_sink_roundtrip",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders GROUP BY 1
    """,
)
def orc_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source round trip — the second columnar format Spark
    ships natively (the Hive-ecosystem interchange peer of parquet).
    Same contract as the parquet/JSONL/CSV roundtrips: written
    distributed, read back, aggregated; equality with the direct oracle
    proves the trip lossless, and the scan side gets the same
    pushdown/pruning treatment as parquet (ORC carries min/max strides
    and column projection)."""
    orders = load_table(spark, sf_dir, "orders")
    out = _scratch_dir("itwiki_orc_sink", sf_dir)
    orders.select("o_orderkey", "o_orderpriority", "o_totalprice").write.mode(
        "overwrite"
    ).orc(out)
    back = spark.read.orc(out)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


# --------------------------------------------------------------------------
@register(
    "csv_malformed_handling",
    # the corruption rule is deterministic (custkey % 7 == 0 gets a
    # non-numeric suffix), so the oracle can replay the parse outcome
    # without ever seeing the dirty file
    oracle="""
    SELECT CAST(count(CASE WHEN c_custkey % 7 <> 0 THEN 1 END) AS BIGINT)
             AS n_good,
           CAST(count(CASE WHEN c_custkey % 7 = 0 THEN 1 END) AS BIGINT)
             AS n_corrupt,
           round(sum(CASE WHEN c_custkey % 7 <> 0 THEN c_acctbal END), 2)
             AS good_acctbal,
           CAST(sum(CASE WHEN c_custkey % 7 <> 0 THEN c_custkey END) AS BIGINT)
             AS good_custkey_sum
    FROM customer
    """,
)
def csv_malformed_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-input robustness of the CSV source: a deterministically
    corrupted feed (every custkey divisible by 7 is rendered with a
    trailing 'x', unparsable as int) is read back in PERMISSIVE mode
    with an explicit ``_corrupt_record`` column — malformed lines
    surface as rows with the raw line captured and typed columns null,
    instead of failing the job or silently vanishing (the behavior a
    100 TB ingest needs: quarantine and count, don't crash). Subtlety
    the aggregate is shaped around: the CSV parser only PARSES the
    columns the query references (column pruning), so a query that
    never touches the malformed field sees zero corruption — the
    aggregate therefore checksums ``c_custkey`` (the corrupted field)
    alongside ``c_acctbal``, forcing a full parse; referencing data
    columns also keeps it clear of Spark's corrupt-record-only
    projection restriction. Output: good/corrupt counts + checksum
    aggregates over the cleanly parsed rows."""
    cust = load_table(spark, sf_dir, "customer")
    dirty_lines = cust.select(
        F.concat_ws(
            ",",
            F.when(
                F.col("c_custkey") % 7 == 0,
                F.concat(F.col("c_custkey").cast("string"), F.lit("x")),
            ).otherwise(F.col("c_custkey").cast("string")),
            F.col("c_acctbal").cast("string"),
        ).alias("value")
    )
    out = _scratch_dir("itwiki_dirty_csv", sf_dir)
    dirty_lines.write.mode("overwrite").text(out)
    parsed = (
        spark.read.schema("c_custkey int, c_acctbal double, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(out)
    )
    return parsed.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1)).alias("n_good"),
        F.count(F.when(F.col("_corrupt_record").isNotNull(), 1)).alias("n_corrupt"),
        F.round(
            F.sum(F.when(F.col("_corrupt_record").isNull(), F.col("c_acctbal"))), 2
        ).alias("good_acctbal"),
        F.sum(F.when(F.col("_corrupt_record").isNull(), F.col("c_custkey")))
        .cast("long")
        .alias("good_custkey_sum"),
    )


# --------------------------------------------------------------------------
@register(
    "lateral_topk_per_customer",
    oracle="""
    SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
    """,
)
def lateral_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — the SQL-standard spelling of
    per-row top-k (each customer's 2 largest orders), the surface a
    SQL-first user reaches for before learning window functions. Spark
    plans the correlation as a join + windowed rank under the hood, so
    the execution is the same set-based shape as
    ``window_topk_per_group``, not a per-customer loop."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
        """
    )


# --------------------------------------------------------------------------
@register(
    "python_datasource_scan",
    oracle="""
    WITH src AS (
      SELECT i AS id, md5(CAST(i AS VARCHAR)) AS fp,
             ('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 4))::INT AS size
      FROM range(5000) t(i))
    SELECT substr(fp, 1, 1) AS bucket, count(*) AS n,
           CAST(sum(size) AS BIGINT) AS total_size, CAST(min(id) AS BIGINT) AS first_id
    FROM src GROUP BY 1
    """,
)
def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector through Spark 4's Python DataSource API
    (sources/pyds.py) — the modern answer to the reference's hand-rolled
    XmlInputFormat (CountReference.java:94-203): ``partitions()``
    declares the splits, the planner schedules one Arrow-fed task per
    split. The source is a deterministic generator, so the oracle
    replays it with SQL ``range()`` — the aggregate hash-matching proves
    every row arrived exactly once across 8 parallel partitions (no
    boundary dupes/drops, the bug class the reference's 110 lines of
    split arithmetic existed to prevent)."""
    from ..sources.pyds import SynthDocsSource

    # runtime conf (vanilla driver session): a reader that implements
    # pushFilters() refuses to initialize unless pushdown is enabled
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(SynthDocsSource)
    except Exception:
        pass  # already registered in this session
    src = (
        spark.read.format("synthdocs")
        .option("n", "5000")
        .option("parts", "8")
        .load()
    )
    return src.groupBy(F.substring("fp", 1, 1).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("size").cast("long").alias("total_size"),
        F.min("id").cast("long").alias("first_id"),
    )


# --------------------------------------------------------------------------
@register(
    "observed_metrics_scan",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc,
           CAST(count(CASE WHEN n_chars >= 200 THEN 1 END) AS BIGINT)
             AS n_quality
    FROM documents
    """,
)
def observed_metrics_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.observe()`` — pipeline telemetry that piggybacks on the main
    job: the metrics are accumulated DURING the pass the query was
    already making (here a noop-sink drain of the corpus scan), not by
    a second scan. At 100 TB this is how row counts, quality-gate
    tallies, and freshness bounds reach the orchestrator for free —
    the declarative analogue of the reference relying on Hadoop's
    built-in job counters. The observed values are returned as a
    one-row frame so the oracle can hash-check that observe() saw
    every row exactly once."""
    from pyspark.sql import Observation

    docs = load_table(spark, sf_dir, "documents")
    obs = Observation("corpus_scan")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.count(F.when(F.col("n_chars") >= 200, 1)).alias("n_quality"),
    )
    observed.write.mode("overwrite").format("noop").save()
    m = obs.get
    return values_df(  # JVM inline table, not a Python-RDD scan (r10)
        spark,
        [
            (
                int(m["n_rows"]),
                int(m["total_chars"]),
                int(m["min_doc"]),
                int(m["max_doc"]),
                int(m["n_quality"]),
            )
        ],
        "n_rows long, total_chars long, min_doc long, max_doc long, n_quality long",
    )


# --------------------------------------------------------------------------
@register(
    "profile_table_stats",
    oracle="""
    WITH s AS (
      SELECT count(*) AS n_rows,
             count(l_linestatus) AS nn_status,
             count(DISTINCT l_orderkey) AS nd_orderkey,
             count(DISTINCT l_returnflag) AS nd_returnflag,
             round(min(l_quantity), 2) AS min_qty,
             round(max(l_quantity), 2) AS max_qty,
             round(avg(l_quantity), 4) AS avg_qty,
             round(min(l_extendedprice), 2) AS min_price,
             round(max(l_extendedprice), 2) AS max_price
      FROM lineitem)
    SELECT col, metric, value FROM (
      SELECT 'l_linestatus' AS col, 'null_frac' AS metric,
             round(1.0 - nn_status * 1.0 / n_rows, 6) AS value FROM s
      UNION ALL SELECT 'l_orderkey', 'n_distinct', nd_orderkey * 1.0 FROM s
      UNION ALL SELECT 'l_returnflag', 'n_distinct', nd_returnflag * 1.0 FROM s
      UNION ALL SELECT 'l_quantity', 'min', min_qty FROM s
      UNION ALL SELECT 'l_quantity', 'max', max_qty FROM s
      UNION ALL SELECT 'l_quantity', 'avg', avg_qty FROM s
      UNION ALL SELECT 'l_extendedprice', 'min', min_price FROM s
      UNION ALL SELECT 'l_extendedprice', 'max', max_price FROM s)
    """,
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profiling — the null fractions, distinct
    cardinalities, and numeric ranges an engine surfaces before anyone
    writes a query (and what a CBO's ANALYZE TABLE collects). ALL
    metrics come from ONE scan: Catalyst fuses the nine aggregates into
    a single partial+final pass (the two COUNT(DISTINCT)s expand to one
    two-key expand-aggregate), then the wide row is unpivoted to the
    (col, metric, value) long form a catalog stores. At 100 TB
    profiling cost = one scan, not one scan per metric."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_linestatus").alias("nn_status"),
        F.countDistinct("l_orderkey").alias("nd_orderkey"),
        F.countDistinct("l_returnflag").alias("nd_returnflag"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )
    wide = s.select(
        F.round(F.lit(1.0) - F.col("nn_status") * 1.0 / F.col("n_rows"), 6)
        .alias("l_linestatus:null_frac"),
        (F.col("nd_orderkey") * 1.0).alias("l_orderkey:n_distinct"),
        (F.col("nd_returnflag") * 1.0).alias("l_returnflag:n_distinct"),
        F.col("min_qty").alias("l_quantity:min"),
        F.col("max_qty").alias("l_quantity:max"),
        F.col("avg_qty").alias("l_quantity:avg"),
        F.col("min_price").alias("l_extendedprice:min"),
        F.col("max_price").alias("l_extendedprice:max"),
    )
    long = wide.unpivot([], list(wide.columns), "key", "value")
    return long.select(
        F.substring_index("key", ":", 1).alias("col"),
        F.substring_index("key", ":", -1).alias("metric"),
        "value",
    )


# --------------------------------------------------------------------------
def _zorder_oracle() -> str:
    from ..operators.layout import zorder_key_sql

    return f"""
    SELECT CAST(zkey // 1024 AS BIGINT) AS zbucket,
           count(*) AS n,
           CAST(min(l_partkey) AS BIGINT) AS min_part,
           CAST(max(l_partkey) AS BIGINT) AS max_part,
           CAST(min(l_suppkey) AS BIGINT) AS min_supp,
           CAST(max(l_suppkey) AS BIGINT) AS max_supp
    FROM (SELECT l_partkey, l_suppkey,
                 {zorder_key_sql('l_partkey', 'l_suppkey')} AS zkey
          FROM lineitem)
    GROUP BY 1
    """


@register("zorder_cluster_stats", oracle=_zorder_oracle())
def zorder_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (l_partkey, l_suppkey) —
    the multi-dimensional layout primitive (operators/layout.py): rows
    are bucketed by their Morton key's upper bits (zkey div 1024) and each
    bucket reports its (partkey, suppkey) bounding box. The tight,
    non-overlapping boxes ARE the data-skipping story: written as files
    (repartitionByRange(zkey) + sortWithinPartitions), a box predicate
    on either dimension prunes most files from their footer stats —
    proven against real parquet footers in
    tests/test_scale_layout.py::test_zorder_layout_prunes_files. Pure
    integer shift/mask algebra, byte-identical in the oracle."""
    from ..operators.layout import zorder_key

    li = load_table(spark, sf_dir, "lineitem")
    zkey = zorder_key(F.col("l_partkey"), F.col("l_suppkey"))
    return (
        li.select("l_partkey", "l_suppkey", zkey.alias("zkey"))
        .groupBy(F.floor(F.col("zkey") / 1024).cast("long").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_partkey").cast("long").alias("min_part"),
            F.max("l_partkey").cast("long").alias("max_part"),
            F.min("l_suppkey").cast("long").alias("min_supp"),
            F.max("l_suppkey").cast("long").alias("max_supp"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "python_datasource_pushdown",
    oracle="""
    WITH src AS (
      SELECT i AS id, md5(CAST(i AS VARCHAR)) AS fp,
             ('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 4))::INT AS size
      FROM range(5000) t(i))
    SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(size) AS BIGINT) AS total_size,
           CAST(min(id) AS BIGINT) AS first_id, CAST(max(id) AS BIGINT) AS last_id
    FROM src WHERE id >= 4000 AND id < 4500
    """,
)
def python_datasource_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pushdown INTO the custom connector: the range filter on
    ``id`` reaches SynthDocsReader.pushFilters at planning time, which
    narrows the split range so ``partitions()`` never emits a task for
    the other 90% of the id space — the custom-source twin of
    PushedFilters on a parquet scan (and asserted structurally in
    tests/test_sources_roundtrip.py: 8 partitions unfiltered, fewer
    and bounds-narrowed with the predicate). The oracle replays the
    filtered generator, proving pruning lost no qualifying row."""
    from ..sources.pyds import SynthDocsSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(SynthDocsSource)
    except Exception:
        pass
    src = (
        spark.read.format("synthdocs")
        .option("n", "5000")
        .option("parts", "8")
        .load()
        .filter((F.col("id") >= 4000) & (F.col("id") < 4500))
    )
    return src.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("size").cast("long").alias("total_size"),
        F.min("id").cast("long").alias("first_id"),
        F.max("id").cast("long").alias("last_id"),
    )


# --------------------------------------------------------------------------
@register(
    "grouped_arrow_agg",
    # value-weighted mean event value per type, plus the exact integer
    # microsecond span of the group — arithmetic chosen to be
    # engine-exact (sum/sum division is one correctly-rounded IEEE op)
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value * value) / sum(value), 6) AS weighted_mean,
           CAST(date_diff('microseconds', min(ts), max(ts)) AS BIGINT)
             AS span_us
    FROM events GROUP BY 1
    """,
)
def grouped_arrow_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``applyInArrow`` — Spark 4's Arrow-NATIVE grouped map: the group
    arrives as a ``pyarrow.Table`` and pyarrow.compute kernels (C++)
    do the math, one less conversion than applyInPandas (no
    Arrow→pandas materialization). This is the right boundary for
    custom per-group logic that pandas semantics would slow down or
    subtly alter (object dtype coercions, NaN vs null). Same scale
    shape as any grouped map: one shuffle on the group key, bounded
    group state. The self-weighted mean Σv²/Σv is a single
    correctly-rounded division of two exact-order-independent sums…
    which ARE order-dependent in float — so both engines round to 6
    decimals, the catalog's standard float discipline."""
    import datetime

    import pyarrow as pa
    import pyarrow.compute as pc

    events = load_table(spark, sf_dir, "events").select("event_type", "value", "ts")

    # NOTE: no type annotations on the UDF — applyInArrow infers its
    # (key, table) vs (table) calling convention from resolvable type
    # hints, and a quoted forward reference fails that inspection
    def stats(key, table):
        v = table["value"]
        wmean = pc.sum(pc.multiply(v, v)).as_py() / pc.sum(v).as_py()
        ts = table["ts"]
        span = pc.subtract(pc.max(ts), pc.min(ts)).as_py()  # timedelta
        return pa.Table.from_pydict(
            {
                "event_type": [key[0].as_py()],
                "n": [table.num_rows],
                "weighted_mean": [round(wmean, 6)],
                "span_us": [span // datetime.timedelta(microseconds=1)],
            }
        )

    return events.groupBy("event_type").applyInArrow(
        stats, "event_type string, n long, weighted_mean double, span_us long"
    )


PARAM_PRICE_FLOOR = 450_000.0  #: named-parameter binding demo threshold


# --------------------------------------------------------------------------
@register(
    "parameterized_sql_topk",
    oracle=f"""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > {PARAM_PRICE_FLOOR}
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def parameterized_sql_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 named-parameter binding): the value
    arrives as a BOUND PARAMETER (:floor), not string interpolation —
    the injection-safe API a query service builds on, and the binding
    is visible to Catalyst as a literal so pushdown/pruning still
    apply. Plan shape: pushed filter + TakeOrderedAndProject."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > :floor
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        args={"floor": PARAM_PRICE_FLOOR},
    )


# --------------------------------------------------------------------------
@register(
    "union_by_name_drift",
    oracle="""
    SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority, 'v1' AS src
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, NULL, o_orderpriority, 'v2'
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def union_by_name_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-DRIFT union: two feed generations project different
    column sets and ``unionByName(allowMissingColumns=True)`` aligns
    them BY NAME with null fill — the API-level twin of the storage-
    level ``mergeSchema`` query. A positional union here would silently
    pair o_totalprice with o_orderpriority; by-name alignment is what
    makes pipelines survive schema evolution."""
    orders = load_table(spark, sf_dir, "orders")
    v1 = (
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_totalprice")
        .withColumn("src", F.lit("v1"))
    )
    v2 = (
        orders.filter(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_orderpriority")
        .withColumn("src", F.lit("v2"))
    )
    return v1.unionByName(v2, allowMissingColumns=True)


# --------------------------------------------------------------------------
@register(
    "cached_scan_reuse",
    oracle="""
    SELECT 'by_status' AS dim, o_orderstatus AS key,
           CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_totalprice > 100000 GROUP BY o_orderstatus
    UNION ALL
    SELECT 'by_priority', o_orderpriority, count(*), round(sum(o_totalprice), 2)
    FROM orders WHERE o_totalprice > 100000 GROUP BY o_orderpriority
    """,
)
def cached_scan_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-consumer CACHE reuse: one filtered projection is persisted
    and two independent aggregations read it — the fan-out shape of a
    reporting job, where recomputing the (possibly expensive) upstream
    per consumer would double the scan. The plan gate asserts BOTH
    branches read InMemoryTableScan rather than re-scanning parquet.
    Memory-and-disk storage level, and unpersist is left to session end
    (blocking unpersist here would defeat the demonstration — the
    returned frame still reads the cache when the driver collects).
    At 100 TB the same decision appears as: cache iff the upstream is
    expensive relative to its size; otherwise let the scans repeat."""
    orders = load_table(spark, sf_dir, "orders")
    hot = (
        orders.filter(F.col("o_totalprice") > 100000)
        .select("o_orderstatus", "o_orderpriority", "o_totalprice")
        .persist()
    )
    by_status = hot.groupBy(F.col("o_orderstatus").alias("key")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    ).select(F.lit("by_status").alias("dim"), "key", "n", "total")
    by_prio = hot.groupBy(F.col("o_orderpriority").alias("key")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    ).select(F.lit("by_priority").alias("dim"), "key", "n", "total")
    return by_status.unionAll(by_prio)


# --------------------------------------------------------------------------
@register(
    "incremental_agg_merge",
    # the oracle is the FULL recompute — equivalence to it is the
    # entire point of a mergeable aggregation state
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY event_type
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable aggregation state — the lambda/incremental-view
    pattern: a rollup maintained from yesterday's materialized partial
    state plus today's delta batch must equal a from-scratch recompute.
    Simulated by splitting events into two disjoint batches (event_id
    parity), aggregating EACH to (count, sum) state rows, then merging
    states with a second-level aggregate (counts add, sums add — the
    algebraic-aggregate property that makes count/sum/min/max
    incrementally maintainable; avg ships as sum+count, never as avg).
    At 100 TB this is why a daily pipeline re-aggregates only the new
    partition and folds it into stored state instead of rescanning the
    corpus: the merge input is state rows (∝ groups), not events. The
    oracle deliberately recomputes from scratch, pinning merge ≡
    recompute."""
    ev = load_table(spark, sf_dir, "events")

    def state(batch: DataFrame) -> DataFrame:
        return batch.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")
        )

    old = state(ev.filter(F.col("event_id") % 2 == 0))
    delta = state(ev.filter(F.col("event_id") % 2 == 1))
    return (
        old.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.round(F.sum("sv"), 2).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "dq_expectations_report",
    oracle="""
    WITH agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) FILTER (l_quantity > 30) AS BIGINT) AS v_qty,
             CAST(count(*) FILTER (l_discount > 0.05) AS BIGINT) AS v_disc,
             CAST(count(*) FILTER (l_returnflag NOT IN ('A', 'N')) AS BIGINT)
               AS v_flag,
             CAST(count(*) FILTER (l_extendedprice <= 0) AS BIGINT) AS v_price,
             CAST(count(*) FILTER (l_orderkey IS NULL) AS BIGINT) AS v_null
      FROM lineitem)
    SELECT rule, n_rows, n_violations,
           round(n_violations * 1.0 / n_rows, 6) AS violation_frac
    FROM (
      SELECT 'quantity_le_30' AS rule, n_rows, v_qty AS n_violations FROM agg
      UNION ALL SELECT 'discount_le_5pct', n_rows, v_disc FROM agg
      UNION ALL SELECT 'returnflag_in_AN', n_rows, v_flag FROM agg
      UNION ALL SELECT 'extendedprice_positive', n_rows, v_price FROM agg
      UNION ALL SELECT 'orderkey_not_null', n_rows, v_null FROM agg)
    """,
)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations (the Deequ/Great-Expectations shape):
    a rule set validated in ONE scan — every rule compiles to a
    conditional count inside the same partial+final aggregate, so
    adding a rule costs an expression, not a pass; the long-form
    (rule, n_rows, n_violations, violation_frac) report then unpivots
    from that single row. This is the admission gate a 100 TB ingest
    runs before publishing a partition: one scan, map-side combine,
    a 5-row result — and a threshold on violation_frac decides
    publish/quarantine. Rules here mix passing and failing on purpose
    (a report that can only say zero is untestable)."""
    li = load_table(spark, sf_dir, "lineitem")
    one = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("l_quantity") > 30, 1)).alias("v_qty"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("v_disc"),
        F.count(F.when(~F.col("l_returnflag").isin("A", "N"), 1)).alias("v_flag"),
        F.count(F.when(F.col("l_extendedprice") <= 0, 1)).alias("v_price"),
        F.count(F.when(F.col("l_orderkey").isNull(), 1)).alias("v_null"),
    )
    rules = one.select(
        F.expr(
            "stack(5,"
            " 'quantity_le_30', v_qty,"
            " 'discount_le_5pct', v_disc,"
            " 'returnflag_in_AN', v_flag,"
            " 'extendedprice_positive', v_price,"
            " 'orderkey_not_null', v_null) AS (rule, n_violations)"
        ),
        "n_rows",
    )
    return rules.select(
        "rule",
        "n_rows",
        "n_violations",
        F.round(F.col("n_violations") * 1.0 / F.col("n_rows"), 6).alias(
            "violation_frac"
        ),
    )


# --------------------------------------------------------------------------
@register(
    "snapshot_diff_cdc",
    oracle="""
    WITH old AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events WHERE user_id % 13 != 0 AND event_id % 97 != 0
      GROUP BY user_id, event_type),
    new AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events WHERE user_id % 11 != 0
      GROUP BY user_id, event_type)
    SELECT COALESCE(o.user_id, n.user_id) AS user_id,
           COALESCE(o.event_type, n.event_type) AS event_type,
           o.n AS n_old, n.n AS n_new,
           CASE WHEN o.user_id IS NULL THEN 'added'
                WHEN n.user_id IS NULL THEN 'removed'
                ELSE 'changed' END AS status
    FROM old o FULL JOIN new n
      ON o.user_id = n.user_id AND o.event_type = n.event_type
    WHERE o.user_id IS NULL OR n.user_id IS NULL OR o.n != n.n
    """,
)
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — change data capture between two versions of a
    keyed rollup, the operator behind incremental sync/audit ('what
    changed since yesterday's publish'). The two snapshots are derived
    deterministically from events (old: misses churned users and ~1%
    of events; new: a different user subset), so all three verdicts
    are populated: keys only in new → 'added', only in old →
    'removed', both-with-different-counts → 'changed'; unchanged keys
    (the vast majority at scale) are filtered OUT — the diff's output
    is ∝ drift, not table size. Shape: two partial+final aggregates
    shuffled once on the same (user_id, event_type) key, then a
    full-outer sort-merge join that reuses that co-partitioning —
    integer count comparisons only, no float drift in the verdict."""
    ev = load_table(spark, sf_dir, "events")

    def snap(pred) -> DataFrame:
        return (
            ev.filter(pred)
            .groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    old = snap((F.col("user_id") % 13 != 0) & (F.col("event_id") % 97 != 0))
    new = snap(F.col("user_id") % 11 != 0).withColumnRenamed("n", "n_new")
    j = old.withColumnRenamed("n", "n_old").join(
        new, ["user_id", "event_type"], "full_outer"
    )
    return j.select(
        "user_id",
        "event_type",
        "n_old",
        "n_new",
        F.when(F.col("n_old").isNull(), F.lit("added"))
        .when(F.col("n_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    ).filter(
        F.col("n_old").isNull()
        | F.col("n_new").isNull()
        | (F.col("n_old") != F.col("n_new"))
    )


# --------------------------------------------------------------------------
@register(
    "sql_udf_disc_price",
    # the oracle inlines the UDF body — which is exactly what Spark's
    # analyzer does to a SQL UDF, so the plans are provably equivalent
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sql_udf_disc_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-side SQL UDF (Spark 4 `CREATE FUNCTION ... RETURN expr`)
    — the user-extension path that does NOT leave the JVM: the analyzer
    inlines the function body into the plan, so the aggregate runs over
    `p * (1 - d)` inside whole-stage codegen exactly as if written
    inline (verify with .explain: no Python eval node, the expression
    sits in partial_sum). This is the right first tool for shared
    business logic at 100 TB — a catalog-registered expression, not a
    Python UDF paying the serialization boundary. Python UDF surfaces
    (Arrow-batched) live in grouped_custom_agg / udtf_token_explode
    for the cases expressions can't cover."""
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
           RETURNS DOUBLE RETURN p * (1 - d)"""
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_sqludf"
    )
    return spark.sql(
        """SELECT l_returnflag,
                  round(sum(disc_price(l_extendedprice, l_discount)), 2)
                    AS revenue
           FROM lineitem_sqludf GROUP BY l_returnflag"""
    )


# ==========================================================================
# TPC-H shape battery (round-5 widening): the remaining classic query
# shapes expressible on the driver testdata's column subset (lineitem
# has no commitdate/receiptdate/shipmode, there is no partsupp table —
# q2/q9/q11/q12/q16/q20/q21 need those and are out of scope; predicates
# are adapted to the synthetic data's 1995-2001 date range and single
# -word p_type values). Each query keeps the canonical plan shape the
# TPC-H number stresses, which is what matters for the 100 TB grade.
#
# Money discipline: revenue aggregates sum EXACT INTEGER CENTS
# (round(x*100) per row, summed as BIGINT, divided back once at the
# end) instead of doubles. A double sum is association-order-dependent;
# at any scale some group's total lands within an ulp of a rounding
# boundary and two engines (or two partitionings of the SAME engine)
# disagree in the last cent — observed live on q10 before this fix.
# Per-row rounding is engine-identical (both Spark and DuckDB round
# half away from zero on the same input double), and the integer sum
# is exact under any association order — so the result is deterministic
# by construction, not by luck. This is also the production-correct
# choice at 100 TB: partitioning changes can never move a reported
# total.
# ==========================================================================


def _cents(col):
    """Exact integer cents for a money expression (see block comment);
    the oracle-side twin is the inlined CAST(round(x * 100) AS BIGINT)."""
    return F.round(col * 100).cast("long")


# --------------------------------------------------------------------------
@register(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS decorrelated into a LEFT SEMI
    join with an extra non-equi conjunct (l_shipdate > o_orderdate; the
    spec's commitdate < receiptdate columns don't exist in the testdata).
    The date filter prunes orders at the scan; the semi join shuffles
    only the surviving quarter of orders and emits each order at most
    once — no fan-out, no dedup pass. One final tiny agg on priority."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
                 / 100.0, 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.05
      AND l_quantity < 25
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, the pushdown litmus
    test — all four predicates reach the parquet reader (PushedFilters)
    and only 4 columns are read, so 100 TB of lineitem costs one
    column-pruned scan and a 1-row partial+final agg. No shuffle beyond
    the single-row final reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.05)
        & (F.col("l_quantity") < 25)
    ).agg(
        F.round(
            F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount"))) / 100.0, 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------
@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                          AS BIGINT)) / 100.0, 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
        OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
      AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1997-12-31'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by year.
    The disjunctive nation-pair predicate can only be applied after BOTH
    nation joins — but those are broadcasts, so the whole filter runs
    map-side before the fact-fact shuffles; the l_shipdate range is
    pushed to the scan. Two shuffle joins (l⋈o on orderkey, ⋈c on
    custkey) and a 3-key agg — the minimum for this shape."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") <= "1997-12-31")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_10")
    ) | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_12"))
    return (
        l.join(broadcast_if_small(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            F.round(
                F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                / 100.0,
                2,
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                          AS BIGINT)) / 100.0, 2) AS revenue,
           round(c.c_acctbal, 2) AS c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue — selective date +
    returnflag filters (both pushed to the scans), a 3-way join keyed on
    custkey/orderkey, a per-customer agg, and a deterministic top-20
    (revenue desc, custkey tiebreak → TakeOrderedAndProject, never a
    full sort). nation broadcasts; the fact-fact joins shuffle only
    filtered rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                / 100.0,
                2,
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
@register(
    "q14_promo_effect",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN CAST(round(l.l_extendedprice
                                            * (1 - l.l_discount) * 100) AS BIGINT)
                                  ELSE 0 END)
                 / sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                            AS BIGINT)), 4)
             AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio over a fact⋈dim
    join. The month filter is pushed to the lineitem scan; part is
    size-gated for broadcast (it scales with SF). Both sums ride one
    partial+final agg — the ratio is computed once at the single final
    row, so float association order is fixed and the 4-dp round is
    engine-stable."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    p = load_table(spark, sf_dir, "part")
    disc_cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        l.join(broadcast_if_small(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", disc_cents).otherwise(
                        F.lit(0).cast("long")
                    )
                )
                / F.sum(disc_cents),
                4,
            ).alias("promo_revenue_pct")
        )
    )


# --------------------------------------------------------------------------
@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o.o_totalprice, 2) AS o_totalprice,
           round(sum(l.l_quantity), 2) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o.o_orderkey LIMIT 100
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery-with-HAVING decorrelated to a
    left-semi join against an aggregate. The heavy part — grouping all
    of lineitem by orderkey — happens once on the slim
    (l_orderkey, l_quantity) projection; survivors (a tiny set) then
    semi-filter orders BEFORE the joins, so the re-join touches only
    qualifying orders. Top-100 by totalprice is TakeOrdered with an
    orderkey tiebreak."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 150)
        .select("l_orderkey")
    )
    o_big = o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
    return (
        c.join(o_big, c.c_custkey == o_big.o_custkey)
        .join(l, o_big.o_orderkey == l.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
@register(
    "q19_discounted_revenue",
    oracle="""
    SELECT round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                          AS BIGINT)) / 100.0, 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive band predicates
    spanning BOTH join sides — the predicate-splitting stress test.
    Catalyst extracts the common single-side conjuncts (brand ∈ {...},
    size/quantity lower bounds) below the join and keeps the cross-side
    disjunction as the join's residual filter; the equi-key (partkey)
    still drives a hash join rather than a nested loop."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    pred = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & q.between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & q.between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & q.between(20, 40)
        )
    )
    return (
        l.join(broadcast_if_small(p), p.p_partkey == l.l_partkey)
        .filter(pred)
        .agg(
            F.round(
                F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                / 100.0,
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT avg(CAST(round(c_acctbal * 100) AS BIGINT)) AS a
      FROM customer WHERE c_acctbal > 0.0)
    SELECT c.c_nationkey, count(*) AS numcust,
           round(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) / 100.0, 2)
             AS totacctbal
    FROM customer c
    WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_nationkey
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (nationkey standing in for the spec's phone-prefix
    country code; "never ordered" becomes "no order since 2000" — on
    this dense synthetic data every customer has SOME order). Rich,
    recently-inactive customers: scalar-subquery average folded in as a
    broadcast cross join (1 row — no window, no driver round-trip), NOT
    EXISTS as a left-anti join on custkey. The average and the filter
    compare exact integer cents, so the above-average cut is
    deterministic (see the money-discipline block comment). At 100 TB
    the anti join shuffles only the above-average slice of customers;
    orders arrives pre-filtered by the pushed-down date predicate and
    pre-projected to its key column."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    cents = _cents(F.col("c_acctbal"))
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg(cents).alias("a"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(cents > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(cents) / 100.0, 2).alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "q8_market_share",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           round(sum(CASE WHEN n2.n_name = 'NATION_12'
                          THEN CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                          * 100) AS BIGINT) ELSE 0 END)
                 * 1.0
                 / sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                            AS BIGINT)), 6) AS mkt_share
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN region r ON n1.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market by year —
    an 8-way join where the numerator is a CONDITIONAL slice of the same
    aggregate as the denominator (one pass, no self-join). nation/region
    broadcast unconditionally; part/supplier are size-gated. Both sums
    are exact integer cents, so the share ratio divides two exact
    integers and rounds identically everywhere."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    zero = F.lit(0).cast("long")
    return (
        # the selective part filter (p_type) joins FIRST: a broadcast
        # probe prunes lineitem map-side BEFORE any fact-fact shuffle,
        # cutting both downstream exchanges by the type selectivity
        # (Spark's CBO join reorder is off by default — written order
        # stands, so write the selective prune first)
        l.join(broadcast_if_small(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(broadcast_if_small(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_12", cents).otherwise(zero)
                )
                * 1.0
                / F.sum(cents),
                6,
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
               AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           round(rv.total_cents / 100.0, 2) AS total_revenue
    FROM supplier s JOIN revenue rv ON s.s_suppkey = rv.l_suppkey
    WHERE rv.total_cents = (SELECT max(total_cents) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the MAX of an
    aggregate view — aggregate once, compare against its own 1-row max
    folded in as a broadcast cross join (the view is consumed by both
    branches; at this size the re-aggregation is cheaper than a
    checkpoint, and Catalyst reuses the shuffle exchange). Ties keep
    every argmax row, exactly as the spec's WHERE total = (SELECT max)
    — no arbitrary LIMIT 1. Revenue totals are exact integer cents, so
    the max comparison is exact equality on integers, immune to the
    float-equality trap the double form would have."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "total_cents"
        )
    )
    mx = revenue.agg(F.max("total_cents").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_cents") == F.col("mx"))
        .join(broadcast_if_small(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_cents") / 100.0, 2).alias("total_revenue"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                 / 100.0 / 7.0, 4) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, avg(l_quantity) AS avg_qty
          FROM lineitem GROUP BY l_partkey) t
      ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < 0.5 * t.avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated aggregate subquery (each line
    compared against ITS part's average quantity) decorrelated into a
    per-key aggregate + equi-join — the rewrite every optimizer performs
    and the only shape that scales (the naive correlated form re-scans
    lineitem per row). The per-part average divides an exact integer sum
    (quantities are integer-valued) by an exact count, so the 0.5×avg
    threshold is engine-deterministic. The brand filter prunes parts
    before the join; the per-part aggregate runs over the full lineitem
    (as the spec's subquery does), keyed on high-cardinality partkey."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    t = l.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        l.join(broadcast_if_small(p), l.l_partkey == p.p_partkey)
        .join(t, l.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(_cents(F.col("l_extendedprice"))) / 100.0 / 7.0, 4
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "python_datasource_sink",
    oracle="""
    SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
)
def python_datasource_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITE side of the Python DataSource API
    (`sources/pyds.py:JsonlManifestSink`): documents stream through a
    custom sink whose task-commit protocol publishes a manifest naming
    exactly the committed files. The round trip then reads ONLY
    manifest-listed files back (explicit schema — no inference scan)
    and aggregates; equality with the direct oracle proves every row
    crossed the connector exactly once. The exactly-once claim is
    exercised, not asserted: before reading back, a decoy
    `part-*-orphan.jsonl` (what a failed speculative attempt would
    leave behind under naive glob reads) is planted in the directory —
    the manifest read never sees it, a glob read would."""
    import json as _json
    import shutil

    from ..sources import pyds

    spark.dataSource.register(pyds.JsonlManifestSink)
    out = _scratch_dir("pyds_sink", sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    (
        docs.repartition(8)
        .write.format(pyds.JSONL_SINK_NAME)
        .option("path", out)
        .mode("append")
        .save()
    )
    # simulate an uncommitted attempt's leftover that a glob would read
    with open(os.path.join(out, "part-99999-orphan.jsonl"), "w") as fh:
        fh.write('{"doc_id": -1, "lang": "xx", "n_chars": 10}\n')
    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        files = [os.path.join(out, n) for n in _json.load(fh)]
    back = spark.read.schema("doc_id long, lang string, n_chars long").json(files)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


# --------------------------------------------------------------------------
@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_c
      FROM lineitem GROUP BY 1, 2),
    eligible AS (
      SELECT s.partkey, s.suppkey, s.cost_c
      FROM supply s
      JOIN supplier su ON su.s_suppkey = s.suppkey
      JOIN nation n ON n.n_nationkey = su.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'AFRICA')
    SELECT round(su.s_acctbal, 2) AS s_acctbal, su.s_name, n.n_name, p.p_partkey,
           round(e.cost_c / 100.0, 2) AS min_cost
    FROM eligible e
    JOIN (SELECT partkey, min(cost_c) AS mc FROM eligible GROUP BY 1) m
      ON e.partkey = m.partkey AND e.cost_c = m.mc
    JOIN part p ON p.p_partkey = e.partkey
    JOIN supplier su ON su.s_suppkey = e.suppkey
    JOIN nation n ON n.n_nationkey = su.s_nationkey
    WHERE p.p_size <= 10 AND p.p_type = 'LARGE'
    ORDER BY s_acctbal DESC, n.n_name, su.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the correlated MIN subquery ("the supplier whose
    cost IS the minimum cost for that part, within a region")
    decorrelated into a per-part min aggregate + equality join — the
    argmin-join rewrite every optimizer performs, and the only shape
    that scales (the correlated form re-probes per row). The supply
    relation is derived from lineitem (the testdata has no partsupp;
    cost = min line price per part-supplier, in exact integer cents so
    the min and the equality probe are engine-deterministic). The
    region restriction applies INSIDE the min, as in the spec — both
    the candidate rows and the min they are compared against see only
    AFRICA suppliers. nation/region broadcast; the two scans of the
    eligible frame share one shuffle key (partkey); ties on min cost
    emit every tied supplier (spec semantics). Deterministic top-100:
    full tiebreak chain, one TakeOrderedAndProject."""
    l = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    supply = l.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(_cents(F.col("l_extendedprice"))).alias("cost_c"))
    eligible = (
        supply.join(broadcast_if_small(su), F.col("suppkey") == su.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("partkey", "suppkey", "cost_c", "s_acctbal", "s_name", "n_name")
    )
    # argmin via a window over high-cardinality partkey: ONE pass over the
    # eligible frame (a groupBy-min + self-join would re-derive it — at
    # 100 TB, a second full lineitem scan + agg), and the min reuses the
    # partkey exchange the aggregate below would need anyway.
    mc = F.min("cost_c").over(Window.partitionBy("partkey"))
    return (
        eligible.withColumn("mc", mc)
        .filter(F.col("cost_c") == F.col("mc"))
        .join(broadcast_if_small(p), F.col("partkey") == p.p_partkey)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            F.round(F.col("cost_c") / 100.0, 2).alias("min_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                          AS BIGINT)
                   - CAST(round(p.p_retailprice * l.l_quantity * 100) AS BIGINT))
                 / 100.0, 2) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE contains(p.p_name, 'bolt')
    GROUP BY 1, 2
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and order
    year — the widest join fan in the battery (lineitem ⋈ part ⋈
    supplier ⋈ orders ⋈ nation) with a substring part filter. Profit =
    discounted revenue − cost (retailprice × qty standing in for
    ps_supplycost; no partsupp in the testdata). Revenue and cost are
    rounded to integer cents SEPARATELY before the subtraction — each
    factor is positive, so no negative-half-cent rounding divergence
    can arise between engines, and the sum of (long − long) is exact.
    The selective p_name filter prunes part first and, at 100 TB,
    flows into lineitem via runtime bloom/DPP; part and nation
    broadcast below the threshold, the two fact joins (orders) shuffle
    on their keys."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("bolt"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit_c = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))) - _cents(
        F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(broadcast_if_small(p), l.l_partkey == p.p_partkey)
        .join(broadcast_if_small(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit_c) / 100.0, 2).alias("profit"))
    )


# --------------------------------------------------------------------------
@register(
    "q11_important_part_value",
    oracle="""
    WITH v AS (
      SELECT l.l_partkey AS partkey,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS val_c
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_8'
      GROUP BY 1)
    SELECT partkey, round(val_c / 100.0, 2) AS value
    FROM v WHERE val_c > (SELECT sum(val_c) * 0.001 FROM v)
    """,
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value restricted to one nation's
    suppliers, kept only where it exceeds a FRACTION OF THE GLOBAL
    TOTAL — the scalar-subquery-in-HAVING pattern. The per-part frame
    is computed once and feeds both the global total (a 1-row
    aggregate folded back as a broadcast cross join — no second scan
    of lineitem, no driver round-trip) and the filter probe. Values
    are exact integer cents, so total × 0.001 is a single correctly
    rounded double multiply — the threshold compare is
    engine-deterministic. At 100 TB: the nation filter prunes
    suppliers before the fact join (broadcast), and the only wide
    shuffle keys on high-cardinality partkey."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_8")
    v = (
        l.join(broadcast_if_small(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("val_c"))
    )
    tot = v.agg((F.sum("val_c") * 0.001).alias("threshold"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("val_c") > F.col("threshold"))
        .select("partkey", F.round(F.col("val_c") / 100.0, 2).alias("value"))
    )


# --------------------------------------------------------------------------
@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT l.l_returnflag AS ship_mode,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag IN ('A', 'N')
      AND l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: did late shipping hit high-priority orders? —
    an equi-join carrying a NON-equi conjunct across the two tables
    (shipped ≥ 90 days after the order date; the testdata has no
    commit/receipt dates, so order→ship lag stands in for
    commit→receipt), plus pivot-style conditional counts. The single-
    table predicates (mode membership, ship-year window) push to the
    lineitem scan; only the cross-table lag condition evaluates post-
    join. Shape note for 100 TB: the join stays a plain shuffled hash/
    sort-merge on orderkey — the non-equi part is a residual filter,
    never a nested-loop trigger."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "N")
        & (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey)
            & (l.l_shipdate >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        )
        .groupBy(F.col("l_returnflag").alias("ship_mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY 1)
    GROUP BY 1
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the customer-order-count DISTRIBUTION — a left
    outer join whose JOIN CONDITION (not a post-filter!) excludes one
    priority class, so customers with zero qualifying orders survive
    with count 0, then a second aggregation histograms the counts.
    Putting the exclusion in the ON clause is the whole point of the
    query: a WHERE would silently drop the zero-order customers. Two
    shuffles (custkey, then the tiny c_count histogram); count(col)
    counts only non-null rows on both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
@register(
    "q16_supplier_part_counts",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
                FROM lineitem)
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           count(DISTINCT ps.suppkey) AS supplier_cnt
    FROM ps JOIN part p ON p.p_partkey = ps.partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND ps.suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many suppliers can serve each (brand, type,
    size) bucket — distinct part-supplier pairs (derived from lineitem;
    no partsupp), a NOT-IN exclusion list (suppliers with negative
    balance standing in for the complaints LIKE), and a COUNT DISTINCT
    over a grouped join. The NOT IN compiles to a broadcast anti join
    (the exclusion list is provably non-null and tiny — its NULL
    trapdoor can't fire); negated part predicates still prune via the
    IN list on size. The distinct-pair dedup and the count-distinct
    both key on high-cardinality partkey — no skew at any scale."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_suppkey")
    )
    ps = (
        l.select(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .distinct()
        .join(
            F.broadcast(bad),
            F.col("suppkey") == F.col("bad_suppkey"),
            "left_anti",
        )
    )
    return (
        ps.join(broadcast_if_small(p), F.col("partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
@register(
    "q20_excess_share_suppliers",
    oracle="""
    WITH q AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2),
    tot AS (SELECT partkey, sum(qty) AS tot_qty FROM q GROUP BY 1),
    excess AS (
      SELECT DISTINCT q.suppkey
      FROM q JOIN tot ON q.partkey = tot.partkey
      JOIN part p ON p.p_partkey = q.partkey
      WHERE p.p_name LIKE 'small%' AND q.qty > 0.4 * tot.tot_qty)
    SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
      AND s.s_suppkey IN (SELECT suppkey FROM excess)
    """,
)
def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the nested semi-join chain — suppliers (in one
    region) qualify through an inner correlated-aggregate condition:
    their shipped quantity of some 'small%' part exceeds 40% of that
    part's total shipped quantity for the year (availqty > ½·Σqty in
    the spec; share-of-total here, same decorrelation). Inner condition
    = per-(part,supp) agg joined to per-part agg — the two aggregates
    share the partkey shuffle and Catalyst reuses the exchange. The
    qualifying-supplier set then semi-joins up to supplier: no
    duplicate suppliers, no fact columns carried. Quantities are
    integer-valued, so the sums and the 0.4× threshold are exact in
    both engines."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    q = l.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.sum("l_quantity").alias("qty"))
    tot = q.groupBy(F.col("partkey").alias("t_partkey")).agg(
        F.sum("qty").alias("tot_qty")
    )
    excess = (
        q.join(tot, F.col("partkey") == F.col("t_partkey"))
        .join(broadcast_if_small(p), F.col("partkey") == p.p_partkey)
        .filter(F.col("qty") > 0.4 * F.col("tot_qty"))
        .select("suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        s.join(F.broadcast(excess), s.s_suppkey == F.col("suppkey"), "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


# --------------------------------------------------------------------------
@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND n.n_regionkey = 0
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the hardest subquery pattern in the spec — an
    EXISTS and a NOT EXISTS against the SAME fact, both correlated on
    the outer row's orderkey AND carrying a non-equi conjunct
    (different supplier). "Which supplier was the sole offender on a
    finished multi-supplier order": returnflag='R' stands in for the
    receipt-after-commit lateness. Compiled as a left-SEMI join (some
    other supplier touched the order) then a left-ANTI join (no other
    supplier was also late) on the slim (orderkey, suppkey) projection
    — the inequality rides as a residual condition on the equi-join,
    never a nested loop. All three fact passes shuffle on orderkey;
    Catalyst reuses the exchange. Deterministic top-100 via
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    l2 = li.select(
        F.col("l_orderkey").alias("lo2"), F.col("l_suppkey").alias("ls2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("lo3"), F.col("l_suppkey").alias("ls3")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    base = (
        l1.join(o, l1.l_orderkey == F.col("o_orderkey"))
        .join(
            l2,
            (l1.l_orderkey == F.col("lo2")) & (l1.l_suppkey != F.col("ls2")),
            "left_semi",
        )
        .join(
            l3,
            (l1.l_orderkey == F.col("lo3")) & (l1.l_suppkey != F.col("ls3")),
            "left_anti",
        )
    )
    return (
        base.join(broadcast_if_small(s), base.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id)
               AS to_type
      FROM events),
    t AS (SELECT from_type, to_type, count(*) AS n
          FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
    tot AS (SELECT from_type, sum(n) AS n_from FROM t GROUP BY 1)
    SELECT t.from_type, t.to_type, t.n,
           round(t.n * 1.0 / tot.n_from, 6) AS p
    FROM t JOIN tot ON t.from_type = tot.from_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence TRANSITION MATRIX (first-order Markov counts +
    probabilities over per-user event paths) — the behavioral-
    analytics staple behind next-action prediction, anomaly detection
    (improbable paths), and funnel discovery (funnel_analysis asserts
    a KNOWN path; this finds the paths). Deterministic sequencing:
    the lead window orders by (epoch microseconds, event_id), a total
    order both engines share even under timestamp ties.

    Scale shape: one window exchange on high-cardinality user_id (the
    sessionize partitioning — biggest task owns one user), then two
    grouped counts on the tiny type×type frame; probabilities are a
    broadcast join against per-source totals. Exact integer counts;
    one rounded ratio."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts")), F.col("event_id")
    )
    seq = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    tot = t.groupBy(F.col("from_type").alias("tf")).agg(F.sum("n").alias("n_from"))
    return (
        t.join(F.broadcast(tot), t.from_type == F.col("tf"))
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n") * 1.0 / F.col("n_from"), 6).alias("p"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "event_interarrival_stats",
    oracle="""
    WITH gaps AS (
      SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                    ORDER BY epoch_us(ts), event_id)
               AS gap_us
      FROM events),
    g AS (SELECT gap_us FROM gaps WHERE gap_us IS NOT NULL)
    SELECT CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(min(gap_us) AS BIGINT) AS min_us,
           CAST(max(gap_us) AS BIGINT) AS max_us,
           CAST(quantile_cont(gap_us, 0.5) AS DOUBLE) AS p50_us,
           CAST(quantile_cont(gap_us, 0.9) AS DOUBLE) AS p90_us,
           CAST(quantile_cont(gap_us, 0.99) AS DOUBLE) AS p99_us
    FROM g
    """,
)
def event_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap statistics over per-user event streams — the
    measurement that JUSTIFIES a sessionization gap parameter (pick
    the session timeout in the p90–p99 valley) and sizes streaming
    watermarks. Exact integer microsecond gaps from a tie-safe lag
    window (same total order as event_transition_matrix); exact
    percentiles at report scale, approx_percentile at 100 TB (the
    percentile_stats substitution row in TUNING.md)."""
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(us, F.col("event_id"))
    gaps = (
        events.select((us - F.lag(us).over(w)).alias("gap_us"))
        .filter(F.col("gap_us").isNotNull())
    )
    return gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_us").alias("min_us"),
        F.max("gap_us").alias("max_us"),
        F.percentile(F.col("gap_us"), F.lit(0.5)).alias("p50_us"),
        F.percentile(F.col("gap_us"), F.lit(0.9)).alias("p90_us"),
        F.percentile(F.col("gap_us"), F.lit(0.99)).alias("p99_us"),
    )


HIST_BINS = 20  #: fixed bin count for the value histogram
HIST_LO = 0.0  #: histogram range [lo, hi); engine-shared literals
HIST_HI = 1000.0


# --------------------------------------------------------------------------
@register(
    "value_histogram_fixed_bins",
    oracle=f"""
    WITH b AS (
      SELECT CAST(CASE WHEN value < {HIST_LO} THEN -1
                  WHEN value >= {HIST_HI} THEN {HIST_BINS}
                  ELSE CAST(floor((value - {HIST_LO})
                       / (({HIST_HI} - {HIST_LO}) / {HIST_BINS})) AS INTEGER)
                  END AS INTEGER) AS bin
      FROM events)
    SELECT bin, CAST(count(*) AS BIGINT) AS n
    FROM b GROUP BY bin
    """,
)
def value_histogram_fixed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram of the value metric with explicit underflow
    (-1) and overflow (HIST_BINS) buckets — the one-pass distribution
    report behind dashboards and drift monitors (bin edges are SHARED
    LITERALS, so two snapshots' histograms are comparable — the
    fixed-vocabulary analogue of corpus_drift_kl's smoothing). Pure
    map + partial+final count agg on ≤ 22 keys: the cheapest possible
    shuffle at any scale. Bin arithmetic is floor((v − lo)/width) on
    doubles — identical rounding-free integers on both engines except
    exact bin-edge values, which land identically because both
    compute the same IEEE division."""
    events = load_table(spark, sf_dir, "events")
    width = (HIST_HI - HIST_LO) / HIST_BINS
    v = F.col("value")
    bin_ = (
        F.when(v < HIST_LO, F.lit(-1))
        .when(v >= HIST_HI, F.lit(HIST_BINS))
        .otherwise(F.floor((v - HIST_LO) / width).cast("int"))
        .cast("int")
    )
    return (
        events.select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
@register(
    "rolling_active_users",
    oracle="""
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    days AS (SELECT DISTINCT d FROM du)
    SELECT days.d,
           CAST((SELECT count(DISTINCT u2.user_id) FROM du u2
                 WHERE u2.d = days.d) AS BIGINT) AS dau,
           CAST(count(DISTINCT du.user_id) AS BIGINT) AS wau
    FROM days JOIN du
      ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
    GROUP BY days.d
    """,
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / rolling-7-day WAU — the activity metric every event
    pipeline reports. Exact rolling DISTINCT is not windowable (distinct
    doesn't decompose over frames), so the standard shape is: dedup to
    (day, user) — the ONLY corpus-sized stage, one partial+final agg —
    then a bounded range self-join (≤ 7 day-rows per anchor) over the
    tiny day×user frame and a distinct count per anchor day. At 100 TB
    the (day, user) frame is still ~days × active-users, orders of
    magnitude under the event count; the scale substitute for truly
    huge user sets is the HLL-sketch union (hll_sketch_union row)."""
    events = load_table(spark, sf_dir, "events")
    du = events.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    days = du.select("d").distinct()
    dau = du.groupBy(F.col("d").alias("dau_d")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    joined = days.join(
        du.select(F.col("d").alias("ud"), "user_id"),
        (F.col("ud") >= F.date_sub(F.col("d"), 6)) & (F.col("ud") <= F.col("d")),
    )
    wau = joined.groupBy("d").agg(F.countDistinct("user_id").alias("wau"))
    return (
        wau.join(dau, wau.d == F.col("dau_d"))
        .select("d", "dau", "wau")
    )


# --------------------------------------------------------------------------
@register(
    "cusum_changepoint",
    # all-integer CUSUM: D_i = n_u·cumsum_i(vi) − i·total_u (vi = value
    # in 1e-6 units) is exact on both engines — no double accumulation
    # order can drift — and only the REPORTED peak divides back to
    # value units at the output boundary
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts,
                      CAST(round(value * 1000000) AS BIGINT) AS vi
               FROM events),
    c AS (SELECT user_id, event_id,
                 sum(vi) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS cum,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS i,
                 count(*) OVER (PARTITION BY user_id) AS n,
                 sum(vi) OVER (PARTITION BY user_id) AS total,
                 ts
          FROM v),
    d AS (SELECT user_id, event_id, n, ts,
                 abs(n * cum - i * total) AS absd
          FROM c),
    r AS (SELECT user_id, event_id, n, absd,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY absd DESC, ts, event_id) AS rn
          FROM d)
    SELECT user_id, event_id AS cp_event_id,
           CAST(n AS BIGINT) AS n_events,
           round(absd / (n * 1000000.0), 6) AS peak_dev
    FROM r WHERE rn = 1
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CUSUM changepoint: the event where the cumulative
    deviation from the user's mean value peaks — the standard
    level-shift detector. Exactness trick: with vi = round(value·1e6)
    the statistic D_i = n·cumsum_i(vi) − i·total is INTEGER, so the
    argmax can never flip on summation-order ulp drift (the rational
    form of Σ(v − mean) without ever materializing the mean). Plan:
    two window passes over (user, ts)-sorted rows (one shuffle), a
    rank, and a filter — no self-join, scales as one sort per user
    partition. Columns: (user_id, cp_event_id, n_events, peak_dev)."""
    events = load_table(spark, sf_dir, "events")
    v = events.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 1000000).cast("long").alias("vi"),
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wa = Window.partitionBy("user_id")
    c = v.select(
        "user_id",
        "event_id",
        "ts",
        F.sum("vi").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.row_number().over(wo).alias("i"),
        F.count(F.lit(1)).over(wa).alias("n"),
        F.sum("vi").over(wa).alias("total"),
    )
    d = c.select(
        "user_id",
        "event_id",
        "ts",
        "n",
        F.abs(F.col("n") * F.col("cum") - F.col("i") * F.col("total")).alias(
            "absd"
        ),
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.col("absd").desc(), "ts", "event_id"
    )
    return (
        d.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("cp_event_id"),
            F.col("n").cast("long").alias("n_events"),
            F.round(F.col("absd") / (F.col("n") * 1000000.0), 6).alias(
                "peak_dev"
            ),
        )
    )


# --------------------------------------------------------------------------
@register(
    "ntile_quartile_profile",
    oracle="""
    WITH q AS (SELECT o_orderpriority, o_totalprice,
                      ntile(4) OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice, o_orderkey)
                          AS quartile
               FROM orders)
    SELECT o_orderpriority, CAST(quartile AS BIGINT) AS quartile,
           count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi,
           round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS DOUBLE) / (count(*) * 100.0), 4) AS avg_price
    FROM q GROUP BY 1, 2
    """,
)
def ntile_quartile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile() quartile profile of order value per priority — the one
    ranking window the battery elsewhere didn't cover. Deterministic
    tie-break (o_orderkey) so both engines bucket identically; the
    per-bucket average goes through integer cents (sum of
    round(price·100) over an exact BIGINT) so no summation-order drift.
    Scale note: ntile is a per-partition total order — fine here
    (priorities bound the partition count and TPC-H order values
    distribute evenly); an unpartitioned global ntile at 100 TB should
    be a percent_rank range-bucketing instead (range partitioning
    scales, single-task windows don't). Columns: (o_orderpriority,
    quartile, n, lo, hi, avg_price)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    q = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
    )
    return q.groupBy("o_orderpriority", F.col("quartile").cast("long").alias("quartile")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast(
                "double"
            )
            / (F.count(F.lit(1)) * 100.0),
            4,
        ).alias("avg_price"),
    )


# --------------------------------------------------------------------------
@register(
    "weighted_median_price",
    # the classic cum-weight rule, all-integer: wi = round(qty·100),
    # pick the first price (in (price, orderkey, linenumber) order)
    # whose running weight reaches half the group total
    oracle="""
    WITH w AS (SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
                      CAST(round(l_quantity * 100) AS BIGINT) AS wi
               FROM lineitem),
    c AS (SELECT l_returnflag, l_extendedprice,
                 sum(wi) OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice, l_orderkey, l_linenumber
                               ROWS UNBOUNDED PRECEDING) AS cw,
                 sum(wi) OVER (PARTITION BY l_returnflag) AS tw
          FROM w),
    p AS (SELECT l_returnflag, l_extendedprice, tw,
                 row_number() OVER (PARTITION BY l_returnflag
                                    ORDER BY cw, l_extendedprice) AS rn
          FROM c WHERE 2 * cw >= tw)
    SELECT l_returnflag,
           round(l_extendedprice, 2) AS weighted_median_price,
           CAST(tw AS BIGINT) AS total_weight_cents
    FROM p WHERE rn = 1
    """,
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag — the weighted
    quantile no built-in aggregate covers: sort the group by price,
    take the first row whose cumulative weight reaches half the total.
    Weights integerize to BIGINT cents so the running sum (the only
    accumulation) is exact on both engines. Plan: one window sort per
    group + a rank — the same one-shuffle shape as any per-group
    cumsum; at 100 TB the returnflag partitioning is coarse, so a real
    deployment sub-partitions by (flag, price-range) and merges the
    per-range cum totals — the token_budget_head shard idiom. Columns:
    (l_returnflag, weighted_median_price, total_weight_cents)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = li.select(
        "l_returnflag",
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity") * 100).cast("long").alias("wi"),
    )
    wo = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wa = Window.partitionBy("l_returnflag")
    c = w.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("wi").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("cw"),
        F.sum("wi").over(wa).alias("tw"),
    ).filter(2 * F.col("cw") >= F.col("tw"))
    wr = Window.partitionBy("l_returnflag").orderBy("cw", "l_extendedprice")
    return (
        c.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.round(F.col("l_extendedprice"), 2).alias("weighted_median_price"),
            F.col("tw").cast("long").alias("total_weight_cents"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "weighted_median_price_sharded",
    # identical semantics to weighted_median_price (provably: the price
    # bucketization is monotone in the window order, so carry-in +
    # within-bucket cumsum equals the global cumsum at every row of the
    # chosen bucket) — the oracle IS the global rule
    oracle="""
    WITH w AS (SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
                      CAST(round(l_quantity * 100) AS BIGINT) AS wi
               FROM lineitem),
    c AS (SELECT l_returnflag, l_extendedprice,
                 sum(wi) OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice, l_orderkey, l_linenumber
                               ROWS UNBOUNDED PRECEDING) AS cw,
                 sum(wi) OVER (PARTITION BY l_returnflag) AS tw
          FROM w),
    p AS (SELECT l_returnflag, l_extendedprice, tw,
                 row_number() OVER (PARTITION BY l_returnflag
                                    ORDER BY cw, l_extendedprice) AS rn
          FROM c WHERE 2 * cw >= tw)
    SELECT l_returnflag,
           round(l_extendedprice, 2) AS weighted_median_price,
           CAST(tw AS BIGINT) AS total_weight_cents
    FROM p WHERE rn = 1
    """,
)
def weighted_median_price_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production-scale form of weighted_median_price — same answer,
    no per-flag total sort. weighted_median_price's one caveat is that
    its cum-weight window is a 3-partition total order (30 M rows sort
    on 3 tasks at sf5). This twin replaces the big sort with the
    two-phase range-bucket rule:

      1. bucket every row by floor(price_cents / W) and hash-aggregate
         per-bucket weight totals (map-side partial agg; the shuffle is
         flags × ~1000 buckets, not the corpus);
      2. a window over that TINY bucket table finds, per flag, the
         first bucket whose cumulative weight reaches half the total,
         plus the exact carry-in weight of all earlier buckets;
      3. a broadcast semi-join prunes the corpus to ONLY the chosen
         bucket per flag (~1/1000 of the rows), and the original
         cum-weight rule runs inside it with the carry-in added — bit
         identical to the global rule because bucketing is monotone in
         the (price, orderkey, linenumber) window order.

    At 100 TB the sorted fraction shrinks with the bucket width dial
    (or recurses: re-bucket the chosen bucket) while phases 1–2 stay
    one scan + one tiny shuffle. Columns: (l_returnflag,
    weighted_median_price, total_weight_cents)."""
    W_CENTS = 10_000  # $100-wide price buckets → ~1000 buckets per flag
    li = load_table(spark, sf_dir, "lineitem")
    w = li.select(
        "l_returnflag",
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity") * 100).cast("long").alias("wi"),
        F.floor(
            F.round(F.col("l_extendedprice") * 100).cast("long") / W_CENTS
        ).alias("pb"),
    )
    bw = w.groupBy("l_returnflag", "pb").agg(F.sum("wi").alias("bw"))
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("pb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = bw.select(
        "l_returnflag",
        "pb",
        "bw",
        F.sum("bw").over(wcum).alias("cbw"),
        F.sum("bw").over(Window.partitionBy("l_returnflag")).alias("tw"),
    )
    first_bucket = Window.partitionBy("l_returnflag").orderBy("pb")
    chosen = (
        cum.filter(2 * F.col("cbw") >= F.col("tw"))
        .withColumn("rn", F.row_number().over(first_bucket))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            "pb",
            (F.col("cbw") - F.col("bw")).alias("carry"),
            "tw",
        )
    )
    cand = w.join(F.broadcast(chosen), ["l_returnflag", "pb"])
    wo = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = cand.select(
        "l_returnflag",
        "l_extendedprice",
        (F.col("carry") + F.sum("wi").over(wo)).alias("cw"),
        "tw",
    ).filter(2 * F.col("cw") >= F.col("tw"))
    wr = Window.partitionBy("l_returnflag").orderBy("cw", "l_extendedprice")
    return (
        c.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.round(F.col("l_extendedprice"), 2).alias("weighted_median_price"),
            F.col("tw").cast("long").alias("total_weight_cents"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "fk_integrity_audit",
    oracle="""
    SELECT 'orders.o_custkey->customer' AS edge,
           (SELECT count(*) FROM orders) AS n_child,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS n_orphans
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey))
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
    """,
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the star schema's FK edges —
    the everyday data-engineering check a warehouse runs before
    publishing: per edge, child row count and orphan count (children
    whose key has no parent) via LEFT ANTI joins. Plan: each edge is
    one anti join — broadcast for the bounded dims (nation), shuffle
    hash for the fact-to-fact edges — plus a count; nothing quadratic,
    every edge independently parallel. Columns: (edge, n_child,
    n_orphans)."""
    tabs = {
        t: load_table(spark, sf_dir, t)
        for t in ("orders", "customer", "lineitem", "part", "supplier", "nation")
    }

    def edge(name, child, ckey, parent, pkey):
        orphans = (
            tabs[child]
            .join(
                tabs[parent].select(F.col(pkey).alias(ckey)),
                ckey,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        total = tabs[child].agg(F.count(F.lit(1)).alias("n_child"))
        return total.crossJoin(orphans).select(
            F.lit(name).alias("edge"), "n_child", "n_orphans"
        )

    rows = [
        edge("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        edge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        edge("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        edge("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        edge("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


# --------------------------------------------------------------------------
@register(
    "null_safe_join_counts",
    # <=> (IS NOT DISTINCT FROM): the join where NULL meets NULL and
    # matches — the semantics a plain equi-join silently drops rows on
    oracle="""
    WITH o AS (SELECT nullif(o_orderstatus, 'O') AS sk, o_orderkey
               FROM orders),
    dim AS (SELECT DISTINCT nullif(o_orderstatus, 'O') AS sk,
                   coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS label
            FROM orders)
    SELECT dim.label, count(o.o_orderkey) AS n_orders
    FROM o JOIN dim ON o.sk IS NOT DISTINCT FROM dim.sk
    GROUP BY dim.label
    """,
)
def null_safe_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-SAFE equi-join (`<=>` / IS NOT DISTINCT FROM) — the one
    join predicate the catalog's join battery didn't cover: the open
    status is nulled out on both sides, and the null-safe condition
    still matches NULL to NULL (a plain `=` would silently drop every
    open order from the join). Spark plans eqNullSafe as a HASH join
    (null-safe keys hash like values — no nested loop), which is the
    100 TB point: null-keyed rows co-locate like any other key.
    Columns: (label, n_orders)."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("sk"), "o_orderkey"
    )
    dim = (
        orders.select(
            F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("sk")
        )
        .distinct()
        .select(
            "sk", F.coalesce(F.col("sk"), F.lit("OPEN")).alias("label")
        )
    )
    return (
        o.join(dim, o["sk"].eqNullSafe(dim["sk"]))
        .groupBy("label")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# --------------------------------------------------------------------------
@register(
    "decimal_exact_aggregation",
    # DECIMAL-typed sums are EXACT (integer arithmetic under the hood)
    # — the accounting-grade aggregation double columns can't give;
    # output re-cast to rounded DOUBLE only at the boundary so the two
    # engines' decimal display scales can't hash-differ
    oracle="""
    SELECT l_returnflag,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE), 2) AS sum_price,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(18,2)))
                      AS DOUBLE), 4) AS sum_discounted,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def decimal_exact_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT decimal aggregation (r10): prices cast to DECIMAL(18,2)
    before summing, so the group totals are integer-exact regardless of
    row order — the accounting-grade contract every double-typed sum in
    the catalog handles by in-query rounding instead. The product
    column exercises decimal×decimal widening (scale 4). Plan shape is
    the ordinary partial+final hash agg; decimal sums stay inside
    whole-stage codegen (Spark's Decimal128 arithmetic), so exactness
    costs no plan change. Columns: (l_returnflag, sum_price,
    sum_discounted, n)."""
    li = load_table(spark, sf_dir, "lineitem")
    dp = F.col("l_extendedprice").cast("decimal(18,2)")
    dd = F.col("l_discount").cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(dp).cast("double"), 2).alias("sum_price"),
        F.round(F.sum(dp * dd).cast("double"), 4).alias("sum_discounted"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
@register(
    "timeseries_gap_fill",
    # the hour grid is generated from the observed span (sequence /
    # generate_series), so empty hours surface as rows; averages go
    # through integer cents before the one rounded division, and the
    # forward-fill is last_value(IGNORE NULLS) on both engines
    oracle="""
    WITH h AS (SELECT event_type,
                      CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour_id,
                      CAST(round(value * 100) AS BIGINT) AS vc
               FROM events),
    agg AS (SELECT event_type, hour_id, count(*) AS n, sum(vc) AS s
            FROM h GROUP BY 1, 2),
    span AS (SELECT min(hour_id) AS h0, max(hour_id) AS h1 FROM h),
    grid AS (SELECT t.event_type, g.hour_id
             FROM (SELECT DISTINCT event_type FROM h) t,
                  (SELECT unnest(generate_series(h0, h1)) AS hour_id
                   FROM span) g),
    f AS (SELECT g.event_type, g.hour_id,
                 coalesce(a.n, 0) AS n_events,
                 round(CAST(a.s AS DOUBLE) / (100.0 * a.n), 4) AS avg_obs
          FROM grid g LEFT JOIN agg a USING (event_type, hour_id))
    SELECT event_type, hour_id, n_events,
           last_value(avg_obs IGNORE NULLS)
             OVER (PARTITION BY event_type ORDER BY hour_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS avg_value_ffill
    FROM f
    """,
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: a dense per-type hourly grid over the
    observed span, zero-filled counts, and forward-filled hourly
    averages. `date_spine_gapfill` covers the literal-spine +
    zero-fill half; this entry adds the other half of regularization:
    the spine derived FROM the data (min/max span aggregate, so no
    hand-maintained range), per-group grids, and forward fill via
    last(ignorenulls) — the carry-forward rule downstream
    window/forecast/anomaly operators assume.

    Plan: hourly hash agg (map-side combined), a 1-row span aggregate
    broadcast under the distinct-types frame, sequence()+explode to
    mint the grid (types x hours rows — KEYS, not data; at 100 TB the
    grid is still |types| x |hours|, independent of event count), left
    join the hourly agg back, then one per-type window for the
    last(ignorenulls) forward fill. Averages are exact integer cents
    until a single rounded division; hours before the first observation
    stay NULL on both engines. Columns: (event_type, hour_id, n_events,
    avg_value_ffill)."""
    ev = load_table(spark, sf_dir, "events")
    hour_id = F.floor(F.unix_micros(F.col("ts")) / F.lit(3_600_000_000)).cast(
        "long"
    )
    h = ev.select(
        "event_type",
        hour_id.alias("hour_id"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    agg = h.groupBy("event_type", "hour_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("vc").alias("s")
    )
    span = h.agg(F.min("hour_id").alias("h0"), F.max("hour_id").alias("h1"))
    grid = (
        h.select("event_type")
        .distinct()
        .join(F.broadcast(span))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hour_id"),
        )
    )
    f = grid.join(agg, ["event_type", "hour_id"], "left").select(
        "event_type",
        "hour_id",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        F.round(F.col("s").cast("double") / (100.0 * F.col("n")), 4).alias(
            "avg_obs"
        ),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return f.select(
        "event_type",
        "hour_id",
        "n_events",
        F.last("avg_obs", ignorenulls=True).over(w).alias("avg_value_ffill"),
    )


# --------------------------------------------------------------------------
@register(
    "grid_nearest_supplier",
    # coordinates are md5-coin integer microdegrees (the engine-portable
    # recipe), distance is exact BIGINT squared euclidean, and the
    # eligibility rule (chebyshev < CELL) makes the 3x3-neighborhood
    # join provably complete — the oracle can therefore use the naive
    # quadratic form and must match bit for bit
    oracle="""
    WITH c AS (SELECT c_custkey,
                 ('0x' || substr(md5('lat:' || c_custkey::VARCHAR), 1, 15))::BIGINT
                   % 180000000 AS lat,
                 ('0x' || substr(md5('lon:' || c_custkey::VARCHAR), 1, 15))::BIGINT
                   % 360000000 AS lon
               FROM customer),
    s AS (SELECT s_suppkey,
                 ('0x' || substr(md5('slat:' || s_suppkey::VARCHAR), 1, 15))::BIGINT
                   % 180000000 AS lat,
                 ('0x' || substr(md5('slon:' || s_suppkey::VARCHAR), 1, 15))::BIGINT
                   % 360000000 AS lon
          FROM supplier),
    pairs AS (SELECT c.c_custkey, s.s_suppkey,
                     (c.lat - s.lat) * (c.lat - s.lat)
                       + (c.lon - s.lon) * (c.lon - s.lon) AS dist2,
                     row_number() OVER (PARTITION BY c.c_custkey
                                        ORDER BY (c.lat - s.lat) * (c.lat - s.lat)
                                               + (c.lon - s.lon) * (c.lon - s.lon),
                                                 s.s_suppkey) AS rn
              FROM c JOIN s
                ON abs(c.lat - s.lat) < 10000000
               AND abs(c.lon - s.lon) < 10000000)
    SELECT c_custkey, s_suppkey, dist2
    FROM pairs WHERE rn = 1
    """,
)
def grid_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed spatial nearest-neighbor join: each customer's
    nearest supplier among those within one cell width (chebyshev
    < CELL microdegrees) on a synthetic integer plane — the standard
    way to do a spatial join without a cross product. Coordinates are
    md5-coin microdegrees in [0, 180M) x [0, 360M) (planar, no
    wraparound — documented simplification); distances are exact BIGINT
    squared euclidean, so there is no float in the ranking at all.

    Plan: both sides bucket to CELL-wide grid cells with integer
    division; the SMALL side (suppliers) explodes to its 3x3 cell
    neighborhood and broadcasts, so the join is an equi-join on
    (cx, cy) — candidates per customer are bounded by cell occupancy,
    never by corpus size. Completeness is provable, not sampled: if
    |dlat| < CELL then the cell indices differ by at most 1 (floor is
    monotone), so every eligible supplier lands in the neighborhood.
    At 100 TB both sides shuffle-partition by cell instead of the
    broadcast, same plan shape; skewed cells shard exactly like the LSH
    bucket caps. Columns: (c_custkey, s_suppkey, dist2)."""
    CELL = 10_000_000  # 10-degree cells in microdegrees

    def coin(prefix: str, key: F.Column, mod: int) -> F.Column:
        cell = F.concat(F.lit(prefix), key.cast("string"))
        return (
            F.conv(F.substring(F.md5(cell), 1, 15), 16, 10).cast("long") % mod
        )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        coin("lat:", F.col("c_custkey"), 180_000_000).alias("lat"),
        coin("lon:", F.col("c_custkey"), 360_000_000).alias("lon"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        coin("slat:", F.col("s_suppkey"), 180_000_000).alias("lat"),
        coin("slon:", F.col("s_suppkey"), 360_000_000).alias("lon"),
    )
    cust = cust.select(
        "c_custkey",
        "lat",
        "lon",
        F.expr(f"lat DIV {CELL}").alias("cx"),
        F.expr(f"lon DIV {CELL}").alias("cy"),
    )
    offsets = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    ).alias("o")
    scand = (
        supp.select(
            "s_suppkey",
            F.col("lat").alias("s_lat"),
            F.col("lon").alias("s_lon"),
            offsets,
        )
        .select(
            "s_suppkey",
            "s_lat",
            "s_lon",
            (F.expr(f"s_lat DIV {CELL}") + F.col("o.dx")).alias("cx"),
            (F.expr(f"s_lon DIV {CELL}") + F.col("o.dy")).alias("cy"),
        )
    )
    cand = cust.join(F.broadcast(scand), ["cx", "cy"]).filter(
        (F.abs(F.col("lat") - F.col("s_lat")) < CELL)
        & (F.abs(F.col("lon") - F.col("s_lon")) < CELL)
    )
    dlat = F.col("lat") - F.col("s_lat")
    dlon = F.col("lon") - F.col("s_lon")
    ranked = cand.select(
        "c_custkey",
        "s_suppkey",
        (dlat * dlat + dlon * dlon).alias("dist2"),
    )
    wr = Window.partitionBy("c_custkey").orderBy("dist2", "s_suppkey")
    return (
        ranked.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "s_suppkey", "dist2")
    )


# --------------------------------------------------------------------------
@register(
    "rolling_hour_peak",
    # a RANGE frame over integer epoch seconds — the event-time sliding
    # window in batch form; peers (equal timestamps) are in-frame on
    # both engines, sums are BIGINT cents
    oracle="""
    WITH e AS (SELECT user_id,
                      CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS es,
                      CAST(round(value * 100) AS BIGINT) AS vc
               FROM events),
    r AS (SELECT user_id,
                 sum(vc) OVER (PARTITION BY user_id ORDER BY es
                               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
                   AS roll_cents,
                 count(*) OVER (PARTITION BY user_id ORDER BY es
                                RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
                   AS roll_n
          FROM e)
    SELECT user_id,
           max(roll_cents) AS peak_hour_cents,
           CAST(max(roll_n) AS BIGINT) AS peak_hour_events
    FROM r GROUP BY user_id
    """,
)
def rolling_hour_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user peak trailing-hour load via a RANGE window frame over
    integer epoch seconds (`RANGE BETWEEN 3600 PRECEDING AND CURRENT
    ROW`). `window_range_frame` (training_data.py) already exercises
    the trailing-sum RANGE frame itself; what this entry adds is the
    PEAK question asked of it — two rolling aggregates (sum + count)
    in one window pass, then a per-user max rollup, the "peak
    concurrent load" shape capacity planning asks for. Peers — events
    sharing a timestamp — are all in-frame by RANGE semantics,
    identically on both engines; sums are BIGINT cents so the peak is
    exact.

    Plan: one shuffle on user_id, one sort per partition, both rolling
    aggregates computed in the same window pass, then an ordinary hash
    agg for the per-user max — no self-join (the naive form is
    events x events ON ts BETWEEN), no explode-per-second. At 100 TB
    it scales as any per-user cumsum; a single hot user shards by time
    range exactly like the sharded weighted median. Columns: (user_id,
    peak_hour_cents, peak_hour_events)."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.floor(F.unix_micros(F.col("ts")) / F.lit(1_000_000))
        .cast("long")
        .alias("es"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("es")
        .rangeBetween(-3600, Window.currentRow)
    )
    r = e.select(
        "user_id",
        F.sum("vc").over(w).alias("roll_cents"),
        F.count(F.lit(1)).over(w).alias("roll_n"),
    )
    return r.groupBy("user_id").agg(
        F.max("roll_cents").alias("peak_hour_cents"),
        F.max("roll_n").cast("long").alias("peak_hour_events"),
    )


# --------------------------------------------------------------------------
@register(
    "max_concurrent_sessions",
    # the sweep line: every interval becomes (+1 at start, -1 at end),
    # one ordered running sum per type gives concurrency at every
    # boundary; ends sort before starts at the same instant (delta
    # ascending) = half-open [start, end) on both engines, all-integer
    oracle="""
    WITH iv AS (SELECT event_type,
                       CAST(epoch_us(ts) AS BIGINT) AS t0,
                       CAST(epoch_us(ts) AS BIGINT) + 1800000000 AS t1
                FROM events),
    pts AS (SELECT event_type, t0 AS t, 1 AS delta FROM iv
            UNION ALL
            SELECT event_type, t1 AS t, -1 AS delta FROM iv),
    sweep AS (SELECT event_type, t, delta,
                     sum(delta) OVER (PARTITION BY event_type
                                      ORDER BY t, delta
                                      ROWS UNBOUNDED PRECEDING) AS conc
              FROM pts),
    peak AS (SELECT event_type, t AS peak_at_us, conc,
                    row_number() OVER (PARTITION BY event_type
                                       ORDER BY conc DESC, t, delta) AS rn
             FROM sweep)
    SELECT event_type,
           CAST(conc AS BIGINT) AS peak_concurrency,
           peak_at_us
    FROM peak WHERE rn = 1
    """,
)
def max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency per event type by sweep line — each
    event opens a 30-minute half-open interval [ts, ts+30min); the
    answer is the classic +1/-1 boundary-point running sum, NOT the
    naive interval self-join (events x events ON overlap), which is
    quadratic in the hot window. Ends sort before starts at the same
    microsecond (delta ascending under the window order), which IS the
    half-open convention; everything is integer microseconds so the
    peak and its first-reached timestamp are exact on both engines.

    Plan: a 2x explode (union of start/end points), one shuffle on
    event_type, one in-partition ordered cumsum, then a rank for the
    earliest peak — linear in events, same shape at 100 TB (a single
    hot type sub-shards by time range with per-range carry-in, exactly
    the sharded-weighted-median idiom). Columns: (event_type,
    peak_concurrency, peak_at_us)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    iv = ev.select(
        "event_type",
        us.alias("t0"),
        (us + F.lit(1_800_000_000)).alias("t1"),
    )
    pts = iv.select(
        "event_type", F.col("t0").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select(
            "event_type", F.col("t1").alias("t"), F.lit(-1).alias("delta")
        )
    )
    wsweep = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sweep = pts.select(
        "event_type",
        "t",
        "delta",
        F.sum("delta").over(wsweep).alias("conc"),
    )
    wpeak = Window.partitionBy("event_type").orderBy(
        F.col("conc").desc(), "t", "delta"
    )
    return (
        sweep.withColumn("rn", F.row_number().over(wpeak))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("conc").cast("long").alias("peak_concurrency"),
            F.col("t").alias("peak_at_us"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "scd2_user_segments",
    # SCD type-2 derivation: collapse consecutive repeats with a
    # lag()-change flag, open validity intervals with lead(); the final
    # rollup keeps the output bounded while the interval math stays the
    # audited core. The last (open-ended) segment of each user is
    # excluded from dwell time — stated, not implied.
    oracle="""
    WITH e AS (SELECT user_id, event_type,
                      CAST(epoch_us(ts) AS BIGINT) AS us, event_id
               FROM events),
    chg AS (SELECT user_id, event_type, us, event_id,
                   CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                        THEN 1 ELSE 0 END AS is_change
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    seg AS (SELECT user_id, event_type, us AS valid_from_us,
                   lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
                     AS valid_to_us
            FROM chg WHERE is_change = 1)
    SELECT user_id, event_type,
           count(*) AS n_segments,
           coalesce(sum(valid_to_us - valid_from_us), 0) AS total_dwell_us
    FROM seg GROUP BY 1, 2
    """,
)
def scd2_user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) derivation from a change
    log: per user, the event_type attribute's validity intervals —
    consecutive repeats collapse via a lag() change flag, then lead()
    on the surviving change rows opens [valid_from, valid_to) for each
    segment (the standard SCD2 build every warehouse runs on CDC
    input). The complementary half of `scd2_segment_upsert`: that
    entry MAINTAINS an existing SCD2 table under a merge batch; this
    one DERIVES the segments from the raw log in the first place. The registered output rolls the interval table up to
    (user, value) segment counts + total dwell so the result stays
    bounded; each user's final open-ended segment contributes a
    segment count but no dwell (NULL lead → excluded by the SUM,
    coalesced to 0 — the stated convention).

    Plan: two windows over the same (user_id, time) sort — Spark
    executes both in ONE shuffle + sort since the partitioning and
    ordering agree — then a hash agg; linear at any scale, and the
    change-collapse means state is per-user O(changes), not O(events).
    Columns: (user_id, event_type, n_segments, total_dwell_us)."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
    )
    worder = Window.partitionBy("user_id").orderBy("us", "event_id")
    chg = e.select(
        "user_id",
        "event_type",
        "us",
        "event_id",
        F.when(
            ~F.lag("event_type").over(worder).eqNullSafe(F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("is_change"),
    )
    wlead = Window.partitionBy("user_id").orderBy("us", "event_id")
    seg = (
        chg.filter(F.col("is_change") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("us").alias("valid_from_us"),
            F.lead("us").over(wlead).alias("valid_to_us"),
        )
    )
    return seg.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.coalesce(
            F.sum(F.col("valid_to_us") - F.col("valid_from_us")), F.lit(0)
        )
        .cast("long")
        .alias("total_dwell_us"),
    )


# --------------------------------------------------------------------------
@register(
    "max_concurrent_sessions_sharded",
    # identical semantics to max_concurrent_sessions (provably: hourly
    # bucketing is monotone in the (t, delta) sweep order within a
    # type, so carry-in + within-bucket cumsum equals the global
    # running sum at every boundary point) — the oracle IS the global
    # sweep
    oracle="""
    WITH iv AS (SELECT event_type,
                       CAST(epoch_us(ts) AS BIGINT) AS t0,
                       CAST(epoch_us(ts) AS BIGINT) + 1800000000 AS t1
                FROM events),
    pts AS (SELECT event_type, t0 AS t, 1 AS delta FROM iv
            UNION ALL
            SELECT event_type, t1 AS t, -1 AS delta FROM iv),
    sweep AS (SELECT event_type, t, delta,
                     sum(delta) OVER (PARTITION BY event_type
                                      ORDER BY t, delta
                                      ROWS UNBOUNDED PRECEDING) AS conc
              FROM pts),
    peak AS (SELECT event_type, t AS peak_at_us, conc,
                    row_number() OVER (PARTITION BY event_type
                                       ORDER BY conc DESC, t, delta) AS rn
             FROM sweep)
    SELECT event_type,
           CAST(conc AS BIGINT) AS peak_concurrency,
           peak_at_us
    FROM peak WHERE rn = 1
    """,
)
def max_concurrent_sessions_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production-scale twin of max_concurrent_sessions — same
    answer, no per-type total sort. The plain sweep's running sum is
    one ordered window per event_type: |types| partitions no matter the
    corpus. This twin shards the sweep by hour bucket:

      1. per (type, hour) boundary-point delta totals — a map-side
         combined hash agg to a TINY table;
      2. a window over that table gives each bucket its carry-in (the
         concurrency entering the hour);
      3. the per-point running sum runs WITHIN each (type, hour)
         partition — types x hours parallelism — with the carry-in
         added, bit-identical to the global sweep because hourly
         bucketing is monotone in the (t, delta) order;
      4. the per-type peak is an ordinary hash-agg argmax over bucket
         peaks (max of a (conc, -t, -delta) struct, so the
         earliest-peak tie rule survives the merge).

    Columns: (event_type, peak_concurrency, peak_at_us)."""
    BUCKET_US = 3_600_000_000
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    iv = ev.select(
        "event_type",
        us.alias("t0"),
        (us + F.lit(1_800_000_000)).alias("t1"),
    )
    pts = iv.select(
        "event_type", F.col("t0").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select(
            "event_type", F.col("t1").alias("t"), F.lit(-1).alias("delta")
        )
    ).withColumn("b", F.expr(f"t DIV {BUCKET_US}"))
    bsum = pts.groupBy("event_type", "b").agg(F.sum("delta").alias("bd"))
    wcarry = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = bsum.select(
        "event_type",
        "b",
        F.coalesce(F.sum("bd").over(wcarry), F.lit(0)).alias("carry"),
    )
    wlocal = (
        Window.partitionBy("event_type", "b")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sweep = pts.join(F.broadcast(carry), ["event_type", "b"]).select(
        "event_type",
        "t",
        "delta",
        (F.col("carry") + F.sum("delta").over(wlocal)).alias("conc"),
    )
    best = sweep.groupBy("event_type").agg(
        F.max(
            F.struct(
                F.col("conc"), (-F.col("t")).alias("nt"), (-F.col("delta")).alias("nd")
            )
        ).alias("m")
    )
    return best.select(
        "event_type",
        F.col("m.conc").cast("long").alias("peak_concurrency"),
        (-F.col("m.nt")).alias("peak_at_us"),
    )
