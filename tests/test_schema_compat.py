"""C5: registry-less schema compatibility semantics."""

import pytest
from pyspark.sql import types as T

from iceberg_kafka_playgroud_spark.functions.schema_compat import (
    SchemaRegistry,
    backward_issues,
)
from iceberg_kafka_playgroud_spark.schema import PURCHASE_EVENT


def _schema(*fields):
    return T.StructType(list(fields))


def test_identical_is_compatible():
    assert backward_issues(PURCHASE_EVENT, PURCHASE_EVENT) == []


def test_added_nullable_field_ok():
    new = T.StructType(PURCHASE_EVENT.fields + [T.StructField("extra", T.StringType(), True)])
    assert backward_issues(PURCHASE_EVENT, new) == []


def test_added_non_nullable_field_fails():
    new = T.StructType(PURCHASE_EVENT.fields + [T.StructField("extra", T.StringType(), False)])
    assert any("must be nullable" in i for i in backward_issues(PURCHASE_EVENT, new))


def test_widening_ok_narrowing_fails():
    old = _schema(T.StructField("x", T.IntegerType(), True))
    wide = _schema(T.StructField("x", T.LongType(), True))
    narrow = _schema(T.StructField("x", T.IntegerType(), True))
    assert backward_issues(old, wide) == []
    assert any("narrowed" in i for i in backward_issues(wide, narrow))


def test_nested_struct_checked():
    old = _schema(T.StructField("s", _schema(T.StructField("a", T.IntegerType(), True)), True))
    bad = _schema(T.StructField("s", _schema(T.StructField("a", T.StringType(), True)), True))
    assert backward_issues(old, bad)


def test_registry_register_or_reuse_and_reject():
    reg = SchemaRegistry()
    v1 = reg.register("purchase_events-value", PURCHASE_EVENT)
    assert v1 == 1
    # identical registration returns the same version (register-or-reuse,
    # kafka_publisher.py:110-137 flow)
    assert reg.register("purchase_events-value", PURCHASE_EVENT) == 1
    evolved = T.StructType(
        PURCHASE_EVENT.fields + [T.StructField("channel", T.StringType(), True)]
    )
    assert reg.register("purchase_events-value", evolved) == 2
    bad = T.StructType(
        PURCHASE_EVENT.fields + [T.StructField("req", T.StringType(), False)]
    )
    with pytest.raises(ValueError, match="BACKWARD"):
        reg.register("purchase_events-value", bad)
    assert reg.subjects() == ["purchase_events-value"]
    assert reg.versions("purchase_events-value") == [1, 2]
