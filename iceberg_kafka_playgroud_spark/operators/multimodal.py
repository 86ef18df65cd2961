"""Multimodal column handling (SURVEY §2.9 X4).

Pattern for image/audio/video at 100 TB: payloads are opaque
``BinaryType`` columns with a typed metadata struct alongside; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so bytes never
round-trip through Python row objects. Parquet stores binary natively
and Spark's vectorized reader streams it in batches.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic stub (`_fake_decode`); everything around
it — schema, batch iteration, UDF signature, output contract — is the
real plumbing and is oracle-checked end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import load_table


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach a binary payload + metadata struct (the multimodal row
    shape). Fixture docs carry no real media, so the payload is the
    utf-8 text bytes — type-wise identical to an image blob."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col("text")).cast("bigint").alias("content_length"),
        ).alias("media_meta"),
    )


def _fake_decode(payload: bytes) -> dict:
    """STUB decoder — stands in for PIL/libav decode, which this
    container lacks. Deterministic features of the raw bytes keep the
    pipeline testable; swap for a real decoder in production."""
    n = len(payload)
    return {
        "payload_len": n,
        "header_hex": payload[:8].hex(),
        "fake_channels": n % 3 + 1,
    }


def multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """Binary payload → per-item features via Arrow-batched mapInPandas."""
    src = with_payload(load_table(spark, sf, "documents"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "origin": pdf["media_meta"].map(lambda m: m["origin"]),
                    "payload_len": feats.map(lambda f: f["payload_len"]),
                    "header_hex": feats.map(lambda f: f["header_hex"]),
                    "fake_channels": feats.map(lambda f: f["fake_channels"]),
                }
            )

    return src.mapInPandas(
        extract,
        schema=(
            "doc_id long, origin string, payload_len long, "
            "header_hex string, fake_channels long"
        ),
    )


QUERIES = {
    "multimodal_features": multimodal_features,
}

ORACLES = {
    # the stub decode is pure byte arithmetic, so plain SQL can predict it
    "multimodal_features": """
        SELECT doc_id,
               source AS origin,
               CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
               lower(hex(encode(substring(text, 1, 8)))) AS header_hex,
               CAST(octet_length(encode(text)) % 3 + 1 AS BIGINT) AS fake_channels
        FROM documents
    """,
}
