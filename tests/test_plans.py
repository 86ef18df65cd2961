"""Plan-shape assertions — scale posture, not just correctness.

These check the *physical plan Catalyst actually picks*: filters reach
the parquet scan, small dims broadcast, top-k avoids a global sort.
At 100 TB these properties are the difference between a working plan
and a dead cluster.
"""

from iceberg_kafka_playgroud_spark.operators import relational
from iceberg_kafka_playgroud_spark.plans.inspect import physical_plan


def test_filter_pushdown(spark, sf_dir):
    plan = physical_plan(relational.filter_predicates(spark, sf_dir))
    assert "PushedFilters: [" in plan
    # at least the IN and range filters are pushed to parquet
    assert "l_returnflag" in plan.split("PushedFilters")[1][:400]


def test_column_pruning(spark, sf_dir):
    plan = physical_plan(relational.scan_project(spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema
    assert "l_comment" not in read_schema and "l_shipdate" not in read_schema


def test_q5_broadcasts_dims(spark, sf_dir):
    plan = physical_plan(relational.q5_region_revenue(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3


def test_topk_no_global_sort(spark, sf_dir):
    plan = physical_plan(relational.sort_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_q1_partial_aggregation(spark, sf_dir):
    plan = physical_plan(relational.q1_pricing_summary(spark, sf_dir))
    # map-side partial agg before the shuffle
    assert "partial_sum" in plan or "HashAggregate" in plan
    # whole-stage codegen spans show as *(n) in the AQE final plan,
    # which only exists after execution
    df = relational.q1_pricing_summary(spark, sf_dir)
    df.collect()
    simple = physical_plan(df, "simple")
    assert "*(" in simple and "isFinalPlan=true" in simple
