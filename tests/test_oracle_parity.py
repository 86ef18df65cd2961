"""Every queries() entry with an oracle must match DuckDB exactly at
sf0.001 (the driver repeats this at sf0.01)."""

import pytest

import __spark_entry__ as entry
from iceberg_kafka_playgroud_spark.verify import (
    compare,
    duckdb_result,
    spark_result,
)

QUERIES = entry.queries()
ORACLES = entry.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(name, spark, ddb, sf_dir):
    fn = QUERIES[name]
    df = fn(spark, sf_dir)
    if name not in ORACLES:
        # rows-only contract: must evaluate without error
        assert df.count() >= 0
        return
    errs = compare(name, spark_result(df), duckdb_result(ddb, ORACLES[name]))
    assert not errs, "\n".join(errs)


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["n_name", "revenue"]
