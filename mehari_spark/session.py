"""SparkSession factory with scale-oriented defaults.

Local sandbox runs on local[N]; the same config block is what we would pass
to spark-submit on a real cluster (AQE + skew-join on, shuffle partitions
sized explicitly per stage, Arrow enabled for the pandas-UDF kernels).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "mehari-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession tuned for this engine.

    ``cores`` pins local parallelism (used by the two-parallelism scaling
    bench); default comes from $SPARK_GRAFT_CPUS (driver contract).
    """
    n = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sp = shuffle_partitions or int(
        os.environ.get("MEHARI_SPARK_SHUFFLE_PARTITIONS", str(DEFAULT_SHUFFLE_PARTITIONS))
    )
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        # shuffle sizing: ~cores locally; documented per-stage in BENCH/BASELINE.md
        .config("spark.sql.shuffle.partitions", str(sp))
        # AQE: runtime coalesce + skew-join splitting (north_rule P15)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow exchange for pandas UDF kernels (mehari-python analog)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # deterministic timestamp semantics vs the DuckDB oracle
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("MEHARI_SPARK_DRIVER_MEM", "8g"))
    )
    # opt-in tmpfs shuffle dir: on a real cluster every executor brings its
    # own local disks, so single-shared-disk shuffle is a local-mode artifact;
    # MEHARI_SPARK_LOCAL_DIR=/dev/shm/... emulates per-node disk bandwidth
    local_dir = os.environ.get("MEHARI_SPARK_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
