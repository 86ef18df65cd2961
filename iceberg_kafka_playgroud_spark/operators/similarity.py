"""Similarity search over embeddings (SURVEY §2.9 X2).

Three operators:

- ``ann_topk_bruteforce`` — exact top-k cosine via pure JVM-side array
  expressions (zip_with + aggregate). The correctness baseline; also
  the oracle twin for the vectorized path.
- ``ann_topk_blocked`` — the scale path: Arrow-batched ``mapInPandas``
  with a NumPy matmul per batch. Queries broadcast (they're tiny);
  the corpus streams through executors in columnar batches; a final
  per-query window takes the top-k. Same results as brute force, so
  it shares the same SQL oracle. At 100 TB this is the
  block-partitioned matmul pattern (queries × corpus-block per task)
  with per-block top-k pushed before the shuffle.
- ``embedding_near_dup_pairs`` — cosine-threshold duplicate pairs
  (X1's embedding tier). Self-join is fine at fixture scale; the
  LSH-bucketed variant for 100 TB reuses ``dedup.lsh_bands`` over
  sign-bit sketches.

Engine-parity: similarity is rounded to 6 decimals *before* ranking /
thresholding in BOTH engines, so FP association differences (Spark
sequential fold vs NumPy SIMD vs DuckDB list_sum) can't flip an
ordering or a threshold decision except on measure-zero boundaries.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..schema import load_table

TOP_K = 5
N_QUERIES = 5  # query set = vec_id < 5
NEAR_DUP_THRESHOLD = 0.45


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def ann_topk_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    em = load_table(spark, sf, "embeddings").select(
        "vec_id", _to_double(F.col("embedding")).alias("vec")
    )
    q = em.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    pairs = F.broadcast(q).crossJoin(em).filter(F.col("vec_id") != F.col("query_id"))
    sims = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qvec"), F.col("vec")), 6).alias("sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


def ann_topk_blocked(spark: SparkSession, sf: str) -> DataFrame:
    """NumPy-matmul ANN over Arrow batches; identical output contract
    (and oracle) as the brute-force baseline."""
    import numpy as np

    em = load_table(spark, sf, "embeddings")
    qrows = (
        em.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)

    def block_sims(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            x_norm = np.linalg.norm(x, axis=1)
            sims = (q_mat @ x.T) / (q_norm[:, None] * x_norm[None, :])
            nq, nx = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, nx),
                    "neighbor_id": np.tile(ids, nq),
                    "sim": np.round(sims.ravel(), 6),
                }
            )

    sims = em.select("vec_id", "embedding").mapInPandas(
        block_sims, schema="query_id long, neighbor_id long, sim double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


def embedding_near_dup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    em = load_table(spark, sf, "embeddings").select(
        "vec_id", _to_double(F.col("embedding")).alias("vec")
    )
    a = em.select(F.col("vec_id").alias("d1"), F.col("vec").alias("v1"))
    b = em.select(F.col("vec_id").alias("d2"), F.col("vec").alias("v2"))
    pairs = a.join(F.broadcast(b), F.col("d1") < F.col("d2"))
    return (
        pairs.select(
            "d1",
            "d2",
            F.round(cosine(F.col("v1"), F.col("v2")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= NEAR_DUP_THRESHOLD)
    )


QUERIES = {
    "ann_topk_bruteforce": ann_topk_bruteforce,
    "ann_topk_blocked": ann_topk_blocked,
    "embedding_near_dup_pairs": embedding_near_dup_pairs,
}

_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
)
_NORM = "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

_TOPK_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
sims AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round({_DOT.format(a='q.qe', b='e.embedding')}
               / ({_NORM.format(a='q.qe')} * {_NORM.format(a='e.embedding')}), 6) AS sim
  FROM q JOIN embeddings e ON e.vec_id != q.query_id
)
SELECT query_id, neighbor_id, sim, rank FROM (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims
) WHERE rank <= 5
"""

ORACLES = {
    "ann_topk_bruteforce": _TOPK_ORACLE,
    "ann_topk_blocked": _TOPK_ORACLE,
    "embedding_near_dup_pairs": f"""
        SELECT a.vec_id AS d1, b.vec_id AS d2,
               round({_DOT.format(a='a.embedding', b='b.embedding')}
                     / ({_NORM.format(a='a.embedding')} * {_NORM.format(a='b.embedding')}), 6) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round({_DOT.format(a='a.embedding', b='b.embedding')}
                    / ({_NORM.format(a='a.embedding')} * {_NORM.format(a='b.embedding')}), 6) >= 0.45
    """,
}
