"""SparkSession factory with scale-oriented defaults.

Single place to configure AQE, Arrow, shuffle sizing.  Tests and bench use
this so the two-parallelism scaling evidence (local[8] vs local[32]) runs the
same config apart from core count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mysql-data-quality-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    Defaults chosen for the 100 TB design point and scaled down for local:
    - AQE on (runtime coalescing + skew-join splitting),
    - Arrow on (all pandas-UDF traffic is Arrow-batched),
    - shuffle partitions sized to parallelism (overridable; on a real
      cluster this would be 2-3x total cores or AQE-coalesced from high),
    - 128 MB target partition bytes at scan.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Scan-parallelism floor (guide §6): several operators are now
        # pure maps with NO exchange (winnowing, token stats, the rule
        # plan), so their parallelism equals the scan split count.  A
        # small parquet input (< openCost x cores bytes) otherwise
        # becomes ONE split = one task pinning one core.  minPartitionNum
        # scales with the session's parallelism (not a local[32]
        # constant) and the lower openCost only affects sub-4MB files;
        # at production scale (files >= maxPartitionBytes) both are
        # no-ops because bytesPerCore dominates.
        .config("spark.sql.files.openCostInBytes", "262144")
        .config("spark.sql.files.minPartitionNum", str(cores * 2))
        .config("spark.sql.session.timeZone", "UTC")
        # NOTE: 8g measured faster than 24g/48g for the string-heavy filter
        # scan on this box (GC dynamics); see BENCH.md
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GC_OPTS", "-XX:+UseG1GC -XX:G1HeapRegionSize=32m"
            ),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...]) -> dict:
    """Read the driver-provided parquet tables as DataFrames."""
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
