"""Kafka source/sink with Confluent-framed Avro (SURVEY §2.1 S1,
§2.5 T1/T2, §2.2 K3).

The reference publishes Avro `PurchaseEvent`s in the Confluent wire
format — magic byte 0x00 + big-endian int32 schema id + Avro body
(serializer at kafka_publisher.py:144-148,358-362) — to topic
``iceberg-topic``, with ``acks=all`` durability
(kafka_publisher.py:213-218).

Spark's ``from_avro``/``to_avro`` speak raw Avro, not the Confluent
framing, so the framing is handled by two pure binary expressions
(``functions.scalar.confluent_header`` / ``strip_confluent_header``)
that run inside codegen. Those are oracle-tested in batch
(``confluent_roundtrip``); the Kafka/Avro calls themselves need the
``spark-sql-kafka`` and ``spark-avro`` jars, absent in this container,
so the builders raise a clear error when the classpath lacks them —
the plan construction logic is identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import confluent_header, strip_confluent_header
from ..schema import PURCHASE_EVENT_AVRO, load_table

DEFAULT_TOPIC = "iceberg-topic"  # connector-config.json:7


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def avro_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.avro.AvroDataToCatalyst"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def _require(spark: SparkSession, what: str, ok: bool) -> None:
    if not ok:
        raise RuntimeError(
            f"{what} support needs its Spark package on the classpath "
            "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13, "
            "org.apache.spark:spark-avro_2.13); not present in this "
            "container — batch framing logic is tested without it."
        )


def purchase_events_to_kafka(
    events: DataFrame,
    brokers: str,
    topic: str = DEFAULT_TOPIC,
    schema_id: int = 1,
):
    """K3: frame PurchaseEvent rows as Confluent Avro and hand them to
    the Kafka sink with the reference's durability settings."""
    spark = events.sparkSession
    _require(spark, "Kafka", kafka_available(spark))
    _require(spark, "Avro", avro_available(spark))
    from pyspark.sql.avro.functions import to_avro

    framed = events.select(
        F.col("user_id").cast("binary").alias("key"),
        F.concat(
            confluent_header(schema_id),
            to_avro(F.struct(*events.columns), PURCHASE_EVENT_AVRO),
        ).alias("value"),
    )
    return (
        framed.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("kafka.acks", "all")  # kafka_publisher.py:213
    )


def purchase_events_from_kafka(
    spark: SparkSession, brokers: str, topic: str = DEFAULT_TOPIC
) -> DataFrame:
    """S1/T2: subscribe, strip the 5-byte header, decode Avro into the
    canonical nested schema."""
    _require(spark, "Kafka", kafka_available(spark))
    _require(spark, "Avro", avro_available(spark))
    from pyspark.sql.avro.functions import from_avro

    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    body = strip_confluent_header(F.col("value"))
    return raw.select(
        from_avro(body, PURCHASE_EVENT_AVRO).alias("event")
    ).select("event.*")


# --- batch-testable framing round-trip (queries() entry) -------------------


def confluent_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Frame each events.props payload with a Confluent header, then
    recover both the schema id and the payload — proves the binary
    framing math without a broker."""
    e = load_table(spark, sf, "events")
    frame = F.concat(confluent_header(42), F.encode(F.col("props"), "utf-8"))
    return e.select(
        "event_id",
        F.lower(F.hex(frame)).alias("frame_hex"),
        F.conv(F.hex(F.substring(frame, 2, 4)), 16, 10).cast("int").alias("schema_id"),
        F.decode(strip_confluent_header(frame), "utf-8").alias("payload"),
    )


QUERIES = {
    "confluent_roundtrip": confluent_roundtrip,
}

ORACLES = {
    "confluent_roundtrip": """
        SELECT event_id,
               lower('00' || lpad(hex(42), 8, '0') || hex(encode(props))) AS frame_hex,
               CAST(42 AS INTEGER) AS schema_id,
               props AS payload
        FROM events
    """,
}
