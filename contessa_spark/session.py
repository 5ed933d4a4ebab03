"""SparkSession factory tuned for this engine.

Local-mode defaults for tests/bench; the same builder flags are what a
production spark-submit would set cluster-side. AQE on (runtime
re-plan + skew-join splitting), Arrow on (every UDF in this engine is
a vectorized pandas UDF), shuffle partitions sized to cores locally
(production: ~2-3× total executor cores, or rely on AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "contessa_spark",
    master: str = None,
    shuffle_partitions: int = None,
    task_cpus: int = 1,
    extra_conf: dict = None,
) -> SparkSession:
    """``task_cpus=2`` is the right setting for pandas-UDF-heavy jobs:
    each UDF task keeps BOTH a JVM serde thread and a Python worker
    busy, so scheduling cores/1 tasks runs 2× cores runnable threads —
    a measurable convoy collapse at high core counts (38s vs 2.3s for
    the same stage at local[32] in this sandbox). Modeling the true
    cost with task.cpus=2 restores linear scaling."""
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else 32
    # Shuffle/spill dir: tmpfs when available. A real cluster gives
    # every executor its own local disks for shuffle; this sandbox has
    # ONE shared NVMe (~456 MB/s), which serializes shuffle I/O across
    # all local[N] threads and skews any scaling measurement. tmpfs
    # (half of 125 GiB here, far above the ~2 GiB shuffle footprint of
    # the largest local job) models per-executor disk bandwidth.
    # Override with SPARK_GRAFT_LOCAL_DIR='' to force the default.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        local_dir = "/dev/shm/spark-local"
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Scan-parallelism FLOOR (not a split-size cap): a single
        # ~100 MB parquet file is one 128 MB split by default, so every
        # scan-heavy stage over it serializes onto one core; the floor
        # makes Spark shrink splits just enough to hand each core work
        # when the files' row groups allow. Scale-correct: at
        # production split counts (≫ cores) it is a no-op, unlike
        # lowering maxPartitionBytes, which would fragment large scans.
        .config("spark.sql.files.minPartitionNum", str(shuffle_partitions))
        .config("spark.task.cpus", str(task_cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Bound Arrow batches by BYTES, not the 10k-row default: text
        # documents average ~2 KB here, so default batches ran ~12-20 MB
        # per worker with matching transient allocations on both sides
        # of the boundary — measured 11.3 s first-run / 4.0 s steady for
        # the 200k-doc annotate stage at local[32] vs 5.2 s / 2.0 s with
        # 2 MB batches (smaller working set + serde/compute overlap).
        # Bytes-based, so narrow-row UDFs keep their large row counts;
        # at cluster scale the same cap bounds per-worker batch memory
        # (guide: lower maxRecordsPerBatch/maxBytesPerBatch for large
        # binary/text cells).
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "2097152")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
