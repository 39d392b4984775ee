"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the
same configs are what we would set cluster-side at 100 TB: AQE on (runtime
skew-join + partition coalescing), UTC session timezone (the reference's
Lambda runs UTC — /root/reference/task.ts parses dates in process TZ, see
SURVEY.md §2.1.3), Arrow for any pandas exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs that query builders re-assert on *any* session
# (including the driver's): correctness must not depend on who built the
# session.  Static confs (driver memory, master) only apply to sessions we
# create ourselves.
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    # ANSI is this build's default and every oracle-backed query is
    # verified under it; pin it so a hostile non-ANSI driver session
    # cannot flip arithmetic overflow from fail-loudly to silent NULL
    # (the round-2 merge.py:188 corruption class).
    "spark.sql.ansi.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # NOTE deliberately absent: canChangeCachedPlanOutputPartitioning.
    # Letting AQE re-coalesce cached plans measured 2x SLOWER on the
    # minhash pipeline at sf0.1/local[32] (the cached signature subtree
    # coalesces below core count and the expensive per-row signature
    # stage serializes), and gains nothing under a default 200-partition
    # session once lift_parallelism targets cores (io.py).
}


def prepare(spark: SparkSession) -> SparkSession:
    """Assert runtime confs on an externally-provided session (driver's)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf not settable on this build — proceed with defaults
    # Size shuffle partitions to the session's actual parallelism.  A
    # driver session left at the 200 default makes every stateful
    # streaming micro-batch pay 200 state-store tasks on a handful of
    # cores (observed: 3.5× a 420 s budget for a 6-batch run on
    # local[4]); AQE coalesces batch exchanges either way, and
    # streaming state partitioning is fixed at first batch — so pin it
    # BEFORE any query starts.
    try:
        cores = spark.sparkContext.defaultParallelism
        spark.conf.set("spark.sql.shuffle.partitions", str(max(8, cores)))
    except Exception:
        pass
    return spark


def cluster_confs(
    executors: int = 1000,
    cores_per_executor: int = 4,
    target_partition_mb: int = 128,
) -> dict[str, str]:
    """The conf profile this engine deploys with at 100 TB — the
    concrete version of every 'at scale' docstring claim, kept next to
    the local profile so the two can't drift silently.

    Sizing logic (not magic numbers):
      * shuffle partitions ≈ 2× total cores — enough waves for AQE's
        coalescer to work DOWN from, while skew-join splits work up;
      * maxPartitionBytes fixes scan-task input, so task count scales
        with data, not cluster (100 TB / 128 MB ≈ 800k scan tasks —
        fine, scheduling is O(ms) per task);
      * broadcast threshold stays modest cluster-side (every executor
        holds a copy; 64 MB × 1000 executors = 64 GB aggregate is the
        budget ceiling, not driver memory);
      * RocksDB state store: heap state OOMs at billions of streaming
        keys (streaming/stateful.py docstring).
    """
    total_cores = executors * cores_per_executor
    return {
        **RUNTIME_CONFS,
        "spark.sql.shuffle.partitions": str(2 * total_cores),
        "spark.sql.files.maxPartitionBytes": str(
            target_partition_mb * 1024 * 1024
        ),
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
            target_partition_mb * 1024 * 1024
        ),
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
    }


def get_spark(app_name: str = "etl-wildweb-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # shuffle partitions sized to cores for local mode; on a real
        # cluster this scales with executor count (or AQE coalesces).
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
