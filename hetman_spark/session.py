"""SparkSession factory with scale-aware defaults.

The reference tunes fixed constants (batch 20, channel cap 1024,
1 s flush — /root/reference/internal/buffer/buffer.go:64,94,107).  The
Spark analogs are session configs; set once here so tests, bench and
spark-submit entrypoints agree.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hetman_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults chosen for the webtext workload:
    - AQE on (+ skew join): runtime re-plan is the backstop for
      hot-domain/lang skew the north_rule calls out.
    - Arrow enabled and batch size capped at 2048: html is a binary
      column of KB–MB per row; huge Arrow batches would blow executor
      memory (SURVEY.md §7 "big binary rows vs Arrow batches").
    - UTC session TZ so DuckDB-oracle comparisons are stable.
    - shuffle partitions ~ cores for local mode; a real cluster run
      overrides via spark-submit --conf.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        spec = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        if spec == "*":
            total = 32
        elif "," in spec:  # local-cluster[N,coresPerExec,mem]
            parts = spec.split(",")
            total = int(parts[0]) * int(parts[1])
        else:
            total = int(spec)
        shuffle_partitions = max(8, total)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # rebalanced write parallelism: 64MB advisory partitions
        # coalesce a few-hundred-MB stage to ~5 tasks and starve the
        # executors (measured: write phase scaled 2->8 cores at 0.54
        # efficiency); 16MB keeps small stages parallel while still
        # producing sane file sizes — at real scale splits are GBs and
        # this knob stops mattering.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 8192 measured 25% faster than 2048 on ~1KB pages (fewer
        # Python round-trips); deployments with multi-KB html payloads
        # should lower this so an Arrow batch stays ~10s of MB
        # (SURVEY §4 "big binary rows vs Arrow batches").
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # stderr progress bars corrupt captured bench/driver output
        .config("spark.ui.showConsoleProgress", "false")
        # every writer in this engine relies on partition-scoped
        # overwrite for idempotent commits (batch manifest + streaming
        # epoch sink); static mode would wipe sibling partitions
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # the `stream` CLI sums rows over recentProgress; the default
        # 100-entry window would undercount drains of >100 micro-batches
        .config("spark.sql.streaming.numRecentProgressUpdates", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    if os.environ.get("HETMAN_SPARK_KAFKA_PACKAGES"):
        # S5/F4 last mile: pull the Kafka connector from Maven at
        # session build.  Opt-in via env because this sandbox has NO
        # network (curl to repo1.maven.org: exit 6, DNS failure —
        # recorded in BENCH.md) and an unreachable resolver would hang
        # every session for minutes of ivy retries.  On a networked
        # cluster: HETMAN_SPARK_KAFKA_PACKAGES=1 (or spark-submit
        # --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2).
        builder = builder.config(
            "spark.jars.packages",
            "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2",
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
