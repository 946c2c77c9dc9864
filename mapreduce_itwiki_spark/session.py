"""SparkSession factory.

Local test profile mirrors the driver environment (local[N], one JVM),
but every knob is chosen so the same plans scale to a multi-executor
cluster: AQE for runtime re-planning (skew joins, small-shuffle
coalescing), Arrow for the few Pandas-UDF paths, UTC session timezone so
results are oracle-comparable, and shuffle partitions sized to cores
locally (override via spark.sql.shuffle.partitions on a real cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "mapreduce_itwiki_spark", cpus: int | str | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or 32 — only meaningful for
    local mode; on a cluster the master/executor topology comes from
    spark-submit and these configs pass through harmlessly.
    """
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # shuffle parallelism ≈ cores locally; AQE coalesces further at runtime
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # every adaptive shuffle STARTS at 8× parallelism and AQE
        # coalesces down by size (advisory 64 MB): big exchanges keep
        # enough partitions that single-phase aggregates (the shared
        # repartition idiom in duplicate_spans / naive Bayes) hold
        # bounded per-task hash state — at the bare session default the
        # sf20 gram stream put ~9 M keys × 32 tasks on one heap and
        # OOMed — while toy-scale exchanges coalesce to a handful of
        # tasks, so the toy bench doesn't pay 256-way scheduling.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(8 * int(cpus)),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # parquet timestamps written without isAdjustedToUTC (naive
        # micros, as the driver's events table is) would otherwise infer
        # as TIMESTAMP_NTZ, which unix_micros/epoch arithmetic rejects.
        # Read them as session-TZ TIMESTAMP instead: with the UTC session
        # timezone above this is exactly DuckDB's naive-=-UTC semantics,
        # so oracle epoch math agrees byte-for-byte.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # whole-stage codegen compiles one JVM class per query stage; a
        # long session running 100+ distinct md5/regex-heavy plans fills
        # the default 240 MB code cache, after which the JIT silently
        # stops compiling and generated code runs INTERPRETED (measured
        # 2 s → 15 s on signature queries late in a bench session).
        # Reserve enough for the whole catalog up front.
        # appended to (not replacing) any user-supplied driver JVM opts
        # from $SPARK_GRAFT_DRIVER_JAVA_OPTIONS, so callers can still
        # pass their own flags (GC logging, heap dumps, …)
        .config(
            "spark.driver.extraJavaOptions",
            (
                os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTIONS", "")
                + " -XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing"
            ).strip(),
        )
        .config("spark.ui.enabled", "false")
        # Local-mode JVM-suicide guard (r10): the virtualization host
        # shows multi-second CPU-steal stalls (TUNING.md). One stalled
        # heartbeat makes HeartbeatReceiver ask the executor to
        # re-register, and in local mode that re-registration can NEVER
        # succeed — BlockManagerMasterEndpoint verifies executor
        # liveness against the CoarseGrainedScheduler endpoint, which
        # does not exist in local mode — so every subsequent heartbeat
        # fails ("Cannot find endpoint: spark://CoarseGrainedScheduler@
        # …") and after spark.executor.heartbeat.maxFailures (default
        # 60, ≈10 min at the 10 s interval) the executor System.exit()s
        # the SHARED driver JVM mid-run. Observed killing 3 of 4 full
        # test-suite runs at round-10 start, each ~10 min in at a
        # different test. In a single-JVM local run "the driver is
        # unreachable, give up" is never the right conclusion, so the
        # failure cap is effectively disabled and the RPC ask timeout
        # is sized to ride out steal bursts. Cluster deployments keep
        # their own defaults — these only bind in this local profile.
        .config("spark.executor.heartbeat.maxFailures", "100000")
        .config("spark.network.timeout", "600s")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
