"""Custom Python DataSource (Spark 4 DataSource V2 Python API) —
SURVEY §2.1 source-category extension.

The reference's synthetic publisher (kafka_publisher.py's deterministic
purchase generator) re-expressed as a FIRST-CLASS Spark source: a
``spark.read.format("purchase_fabric")`` batch source implemented with
``pyspark.sql.datasource.DataSource`` — schema declaration, option
handling, and PARTITION-PARALLEL reads (each InputPartition generates
its own id range executor-side; the driver never materializes a row).

This is the integration shape for any Python-only system (internal
REST feeds, bespoke file formats, simulation generators) at 100 TB:
partition count scales with executors, generation is pure and
deterministic per partition, and Catalyst sees a normal relation it
can prune/aggregate over.

The row rule matches sources/rate_fabric.py exactly (ts = base +
id·5000 ms, amount = (ts//10 % 1000)/100), so the SQL oracle replays
the source from ``generate_series``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

FABRIC_BASE_MS = 1740787200000
DEFAULT_ROWS = 1200
DEFAULT_PARTS = 8
N_BUCKETS = 4


class FabricDataSource(DataSource):
    """Batch source producing the deterministic purchase fabric."""

    @classmethod
    def name(cls) -> str:
        return "purchase_fabric"

    def schema(self) -> str:
        return "id bigint, ts_ms bigint, user_id string, amount double"

    def reader(self, schema) -> "FabricReader":
        return FabricReader(self.options)


class FabricReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_rows = int(options.get("n_rows", DEFAULT_ROWS))
        self.n_parts = int(options.get("n_parts", DEFAULT_PARTS))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition):
        i = partition.value
        lo = i * self.n_rows // self.n_parts
        hi = (i + 1) * self.n_rows // self.n_parts
        for rid in range(lo, hi):
            ts = FABRIC_BASE_MS + rid * 5000
            yield (rid, ts, f"user_{rid % 1000}", (ts // 10 % 1000) / 100.0)


def _register(spark: SparkSession) -> None:
    # registration is idempotent per session; re-registering the same
    # name raises, so gate on a session-local marker
    key = "spark_graft.fabric_source_registered"
    if spark.conf.get(key, None) != "1":
        spark.dataSource.register(FabricDataSource)
        spark.conf.set(key, "1")


def source_python_datasource(spark: SparkSession, sf: str) -> DataFrame:
    """Read the custom Python source and fold it to a per-bucket audit
    (count, exact cents, id-sum) — proving the source's schema,
    options, partitioning, and row contents all at once. The oracle
    regenerates the identical rows from generate_series."""
    _register(spark)
    df = (
        spark.read.format("purchase_fabric")
        .option("n_rows", str(DEFAULT_ROWS))
        .option("n_parts", str(DEFAULT_PARTS))
        .load()
    )
    return (
        df.groupBy((F.col("id") % N_BUCKETS).alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.round(F.col("amount") * 100).cast("long"))
            .cast("long")
            .alias("cents_sum"),
            F.sum("id").cast("long").alias("id_sum"),
        )
        .orderBy("bucket")
    )


QUERIES = {
    "source_python_datasource": source_python_datasource,
}

ORACLES = {
    "source_python_datasource": f"""
        WITH fab AS (
          SELECT id, ({FABRIC_BASE_MS} + id * 5000) // 10 % 1000 AS cents
          FROM (SELECT unnest(generate_series(0, {DEFAULT_ROWS - 1})) AS id)
        )
        SELECT CAST(id % {N_BUCKETS} AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(cents) AS BIGINT) AS cents_sum,
               CAST(SUM(id) AS BIGINT) AS id_sum
        FROM fab GROUP BY bucket ORDER BY bucket
    """,
}
