"""Physical-layout scale features: bucketed tables (shuffle-free
co-located joins) and partitioned writes (partition pruning). These are
the M5 'would this hold at 1000×' levers — at 100 TB, bucketing both
fact tables on the join key removes the dominant shuffle entirely, and
partitioned layout turns a full scan into a directory prune."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from mapreduce_itwiki_spark.sources.parquet import load_table

from conftest import SF_SMALL


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # saveAsTable writes into the session warehouse; isolate per-run tables
    return spark


def test_bucketed_join_has_no_shuffle(spark):
    """orders ⨝ lineitem both bucketed by the join key → SortMergeJoin
    with ZERO Exchange on either side (co-located partitions)."""
    import shutil

    orders = load_table(spark, SF_SMALL, "orders")
    li = load_table(spark, SF_SMALL, "lineitem")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("orders_b", "lineitem_b"):  # dirs may outlive the metastore
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("orders_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("lineitem_b")

    # at sf0.001 the planner would rather broadcast (and rightly so);
    # turn that off to exercise the big-table path bucketing exists for
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).select(
            "o_orderkey", "l_quantity"
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, plan  # no shuffle: co-located buckets
        assert "Bucketed: true" in plan
        assert "SortMergeJoin" in plan
        expect = (
            load_table(spark, SF_SMALL, "orders")
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .count()
        )
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_dynamic_partition_pruning(spark, tmp_path):
    """DPP: joining a partitioned fact against a FILTERED dim must prune
    fact partitions with a runtime subquery (dynamicpruningexpression in
    PartitionFilters) — the filter value isn't known until the dim side
    runs, yet only matching directories are scanned. At 100 TB this is
    the difference between scanning one date partition and all of them."""
    from pyspark.sql import functions as F

    events = load_table(spark, SF_SMALL, "events")
    out = str(tmp_path / "dpp_events")
    events.withColumn("etype", F.col("event_type")).write.partitionBy("etype").mode(
        "overwrite"
    ).parquet(out)
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("purchase", 1), ("click", 2), ("signup", 3), ("error", 4), ("view", 5)],
        ["dtype", "weight"],
    ).filter(F.col("weight") == 1)
    j = fact.join(dim, fact.etype == dim.dtype).groupBy("etype").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = _plan(j)
    assert "dynamicpruning" in plan.lower(), plan
    rows = j.collect()
    assert len(rows) == 1 and rows[0].etype == "purchase"
    expect = events.filter(F.col("event_type") == "purchase").count()
    assert rows[0].n == expect


def test_salted_agg_on_pathological_skew(spark):
    """A synthetic corpus where ONE key owns 50% of all rows — the
    single-hot-key shape AQE's skew handling can't always split for
    non-algebraic aggregates. The salted two-phase distinct-count must
    equal the plain plan exactly on this worst case."""
    from pyspark.sql import functions as F

    from mapreduce_itwiki_spark.operators.skew import salted_distinct_count

    n = 20_000
    base = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("key"),
        (F.col("id") % 513).cast("string").alias("member"),
    )
    plain = {
        (r.key): r.n
        for r in base.groupBy("key")
        .agg(F.countDistinct("member").alias("n"))
        .collect()
    }
    salted = {
        r.key: r.n
        for r in salted_distinct_count(base, "key", "member", n_salts=8, out="n").collect()
    }
    assert salted == plain
    assert plain["HOT"] == 513  # the hot key really is hot


def test_csv_permissive_parse_quarantines_bad_rows(spark, tmp_path):
    """Dirty CSV: PERMISSIVE mode + columnNameOfCorruptRecord keeps the
    scan alive and quarantines malformed rows instead of failing the
    job — the ingestion posture for 100 TB of third-party data."""
    p = tmp_path / "dirty.csv"
    p.write_text(
        "id,qty,price\n"
        "1,5,10.5\n"
        "2,not_a_number,3.25\n"
        "3,7,bad_price\n"
        "4,2,99.0\n",
        encoding="utf-8",
    )
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .schema("id int, qty int, price double, _bad string")
        .csv(str(p))
    )
    rows = df.collect()
    good = [r for r in rows if r._bad is None]
    bad = [r for r in rows if r._bad is not None]
    assert len(rows) == 4
    assert {r.id for r in good} == {1, 4}
    assert len(bad) == 2  # quarantined, not dropped, not fatal
    """events partitioned by event_type: a type filter must prune
    partitions at planning time (scan reads 1/5 of the directories)."""
    events = load_table(spark, SF_SMALL, "events")
    out = str(tmp_path / "events_part")
    events.withColumn("etype", F.col("event_type")).write.partitionBy("etype").mode(
        "overwrite"
    ).parquet(out)

    back = spark.read.parquet(out).filter(F.col("etype") == "purchase")
    plan = _plan(back)
    # partition filters appear as PartitionFilters on the scan, and the
    # data filter does NOT appear as a PushedFilter (it's prune-only)
    assert "PartitionFilters" in plan
    assert "etype" in plan.split("PartitionFilters", 1)[1].split("\n")[0]
    n = back.count()
    expect = events.filter(F.col("event_type") == "purchase").count()
    assert n == expect


def test_zorder_layout_prunes_files(spark, tmp_path):
    """Z-order clustering vs single-column sorting, proven from the
    ACTUAL parquet footers of written files: for a two-dimensional box
    predicate, the fraction of files whose (l_partkey, l_suppkey)
    min/max stats intersect the box must be substantially smaller under
    the Morton layout — single-column sort gives tight ranges on the
    sort key only, so nearly every file matches a suppkey-side
    predicate. This is the evidence behind zorder_cluster_stats'
    data-skipping claim (operators/layout.py)."""
    import pyarrow.parquet as pq

    from mapreduce_itwiki_spark.operators.layout import minmax_scale, zorder_key

    li = load_table(spark, SF_SMALL, "lineitem").select("l_partkey", "l_suppkey")
    n_files = 16

    linear = str(tmp_path / "linear")
    (
        li.repartitionByRange(n_files, F.col("l_partkey"))
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zordered = str(tmp_path / "zordered")
    # align the 200-value and 10-value dimensions to 8 bits each before
    # interleaving — unscaled, partkey's extra bits dominate the key and
    # the curve degenerates to a partkey sort (no suppkey pruning)
    zk = zorder_key(
        minmax_scale(F.col("l_partkey"), 0, 199, bits=8),
        minmax_scale(F.col("l_suppkey"), 0, 9, bits=8),
        bits=8,
    )
    (
        li.withColumn("zkey", zk)
        .repartitionByRange(n_files, F.col("zkey"))
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(zordered)
    )

    # predicates probe the dimension the linear layout did NOT sort by:
    # a suppkey slice. Linear files each span the full suppkey domain
    # (sorted by partkey only), so every file survives; z-order files
    # cover suppkey rectangles, so most are skipped from footer stats.
    SUPP_LO, SUPP_HI = 3, 3  # one supplier of 0..9

    def files_matching(path: str) -> tuple[int, int]:
        import glob

        matched = total = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = hi = None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == "l_suppkey" and col.statistics:
                        s = col.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            total += 1
            if lo <= SUPP_HI and hi >= SUPP_LO:
                matched += 1
        return matched, total

    lin_m, lin_t = files_matching(linear)
    zo_m, zo_t = files_matching(zordered)
    assert lin_t >= n_files // 2 and zo_t >= n_files // 2  # both actually split
    # the linear layout cannot skip anything on the non-sort dimension
    assert lin_m == lin_t, (lin_m, lin_t)
    # z-order must skip MOST files for the one-supplier slice
    assert zo_m <= zo_t // 2, (zo_m, zo_t, lin_m, lin_t)


def test_small_file_compaction(spark, tmp_path):
    """Small-file compaction — the operational fix for the many-tiny-
    files problem every long-running 100 TB pipeline accumulates (NN
    pressure, per-file open cost, starved scan parallelism). Two
    levers, both pinned: (1) repartition-rewrite collapses a 64-shard
    spray into exactly 4 files with byte-identical content; (2) the
    ``maxRecordsPerFile`` governor bounds file size on write so a big
    partition splits into ceil(rows/limit) files without a shuffle."""
    import glob

    src = str(tmp_path / "sprayed")
    dst = str(tmp_path / "compacted")
    gov = str(tmp_path / "governed")
    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    n_rows = ev.count()
    ev.repartition(64).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 64

    sprayed = spark.read.parquet(src)
    sprayed.repartition(4).write.parquet(dst)
    assert len(glob.glob(f"{dst}/part-*.parquet")) == 4
    compacted = spark.read.parquet(dst)
    # byte-identical content, both directions
    assert compacted.count() == n_rows
    assert compacted.exceptAll(ev).isEmpty() and ev.exceptAll(compacted).isEmpty()

    per_file = (n_rows // 4) + 1
    sprayed.coalesce(1).write.option("maxRecordsPerFile", per_file).parquet(gov)
    files = glob.glob(f"{gov}/part-*.parquet")
    assert len(files) == 4  # one writer task, governor splits the output
    assert spark.read.parquet(gov).count() == n_rows


def test_aqe_splits_skewed_join_at_runtime(spark):
    """Runtime proof of the AQE skew-join lever the session enables
    (`session.py`: adaptive.skewJoin): plant a join where ONE key owns
    ~90% of the left side, lower the skew thresholds to test scale,
    force the at-scale sort-merge shape (no broadcast), and assert the
    FINAL adaptive plan actually split the hot partition — the join
    node carries the `skew=true` marker only when AQE rewrote it. This
    is the runtime complement to the salting fallback above: skewed
    equi-JOINS need no hand-salting at 100 TB, AQE re-plans them; the
    salted operator remains for non-algebraic aggregates."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        n = 200_000
        left = spark.range(n).select(
            F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 1000)
            .cast("long").alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), F.col("id").alias("dim_val")
        )
        joined = left.join(right, "k")
        # execute through the DataFrame's OWN QueryExecution (count()
        # builds a separate plan whose adaptive state we can't inspect)
        assert len(joined.collect()) == n
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
