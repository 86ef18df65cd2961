"""Unit pins for operators/distributed.py — the prefix-sum primitives
every de-globalized window rewrite rides on. The oracle suite proves
the four rewritten operators end-to-end; these pin the primitives
themselves against the window functions they replace, on shapes the
fixtures don't exercise (empty input, nulls-last keys, more partitions
than rows, every ntile remainder class)."""

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from iceberg_kafka_playgroud_spark.operators.distributed import (
    ntile_expr,
    ranked_total,
    running_sum_total,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v long")


def test_ranked_total_matches_global_window(spark):
    rows = [(i * 7 % 53, i) for i in range(200)]  # unique (k, v) pairs
    df = _df(spark, rows)
    order = [F.col("k").asc(), F.col("v").asc()]
    got, total = ranked_total(df, order, "rk", num_partitions=8)
    assert total == 200
    expect = df.withColumn(
        "rk_w", F.row_number().over(W.orderBy(*order)).cast("long")
    )
    joined = got.join(expect, ["k", "v"])
    assert joined.filter(F.col("rk") != F.col("rk_w")).count() == 0


def test_ranked_total_nulls_last_ordering(spark):
    rows = [(None, 1), (5, 2), (None, 3), (1, 4)]
    df = spark.createDataFrame(rows, "k long, v long")
    order = [F.col("k").desc_nulls_last(), F.col("v").asc()]
    got, total = ranked_total(df, order, "rk", num_partitions=4)
    assert total == 4
    ranks = {(r["k"], r["v"]): r["rk"] for r in got.collect()}
    # desc nulls last: 5, 1, then the two nulls in v order
    assert ranks[(5, 2)] == 1 and ranks[(1, 4)] == 2
    assert ranks[(None, 1)] == 3 and ranks[(None, 3)] == 4


def test_ranked_total_more_partitions_than_rows(spark):
    df = _df(spark, [(3, 1), (1, 2)])
    got, total = ranked_total(
        df, [F.col("k").asc(), F.col("v").asc()], "rk", num_partitions=16
    )
    assert total == 2
    assert {(r["k"], r["rk"]) for r in got.collect()} == {(1, 1), (3, 2)}


def test_ranked_total_empty_input(spark):
    df = _df(spark, []).filter(F.lit(False))
    got, total = ranked_total(df, [F.col("k").asc()], "rk")
    assert total == 0 and got.count() == 0


def test_running_sum_matches_global_window(spark):
    rows = [((i * 13) % 31, 10 + i) for i in range(100)]
    df = _df(spark, rows)
    order = [F.col("k").asc(), F.col("v").asc()]
    got, total = running_sum_total(df, order, "v", "cum", num_partitions=8)
    assert total == sum(v for _, v in rows)
    expect = df.withColumn(
        "cum_w",
        F.sum("v")
        .over(
            W.orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .cast("long"),
    )
    joined = got.join(expect, ["k", "v"])
    assert joined.filter(F.col("cum") != F.col("cum_w")).count() == 0


def test_ntile_expr_matches_ntile_all_remainders(spark):
    # n mod k sweeps 0..k-1: every bucket-size remainder class
    # (17->1, 18->2, 20->0, 23->3)
    for n in (17, 18, 20, 23):
        df = spark.range(1, n + 1).select(F.col("id").cast("long").alias("rk"))
        got = df.select(
            "rk", ntile_expr("rk", n, 4).alias("b")
        )
        expect = df.select(
            "rk", F.ntile(4).over(W.orderBy("rk")).alias("b_w")
        )
        j = got.join(expect, "rk")
        assert j.filter(F.col("b") != F.col("b_w")).count() == 0, n


def test_ntile_expr_fewer_rows_than_buckets(spark):
    df = spark.range(1, 4).select(F.col("id").cast("long").alias("rk"))
    got = {r["rk"]: r["b"] for r in df.select("rk", ntile_expr("rk", 3, 10).alias("b")).collect()}
    assert got == {1: 1, 2: 2, 3: 3}


def test_ranked_total_invariant_to_partition_count(spark):
    """The rank must be a pure function of the DATA — any partition
    count (including 1) yields identical ranks, or the prefix-sum
    rewrite would silently depend on cluster layout."""
    rows = [((i * 11) % 97, i) for i in range(150)]
    df = _df(spark, rows)
    order = [F.col("k").asc(), F.col("v").asc()]
    baseline = None
    for npart in (1, 3, 32):
        got, total = ranked_total(df, order, "rk", num_partitions=npart)
        assert total == 150
        snap = sorted((r["k"], r["v"], r["rk"]) for r in got.collect())
        if baseline is None:
            baseline = snap
        else:
            assert snap == baseline, f"ranks differ at npart={npart}"
