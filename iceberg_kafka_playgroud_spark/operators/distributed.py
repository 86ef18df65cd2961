"""Distributed total-order primitives — the scale-safe replacement for
global (unpartitioned) window functions.

``row_number()/ntile()/sum() OVER (ORDER BY ...)`` with no PARTITION BY
compiles to a single-partition WindowExec: every row funnels through
one task, which is fine on a 600 k-row fixture and fatal on a
1000-executor cluster.  The standard distributed rewrite (the textbook
parallel prefix-sum) is implemented here once and reused by every
operator that needs an exact global rank / running total:

1. ``repartitionByRange`` on the sort key — Spark's range partitioner
   assigns ascending, non-overlapping key ranges to ascending partition
   ids (the same machinery behind ``df.sort``), so partition id order
   IS key order.
2. ``localCheckpoint(eager=True)`` pins the partitioning: the per-
   partition counts collected in step 3 and the per-partition window in
   step 4 both read the SAME materialized partitions, so the prefix
   offsets can never drift from the data (range-bound sampling is never
   re-run).
3. One bounded driver-side collect of *num_partitions* rows (partition
   id → row count / value sum) builds the exclusive prefix offsets —
   O(shuffle.partitions), independent of data size, same bounded-
   collect class as the IVF codebook in ``similarity.py``.
4. A window PARTITIONED BY the range-partition id computes the local
   rank / local running sum in parallel; adding the broadcast offset
   yields the exact global value.

The sort key must be a total order (callers pass a unique tie-break
column, e.g. ``doc_id``) — with duplicate keys the within-key order
would be nondeterministic, exactly as it is for a global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..checkpoints import memo_local_checkpoint

__all__ = ["ranked_total", "running_sum_total", "ntile_expr"]

_PID = "__dist_pid"


def _range_checkpoint(
    df: DataFrame, order_cols: list[Column], num_partitions: int | None
) -> DataFrame:
    """Range-partition ``df`` on ``order_cols`` and pin the layout.

    ``order_cols`` are sort expressions (``.asc_nulls_last()`` etc.
    respected by both the range partitioner and the downstream window).

    Memoized per (session, plan): the checkpoint is referenced by the
    returned plan, so it can't be released before the caller consumes
    the result — without the memo every invocation (each warm bench
    repetition, every dependent operator) would trigger a fresh
    range-shuffle job AND leak one more full materialized copy into
    block-manager storage (checkpoints are instance-keyed, unlike
    ``cache()``; see checkpoints.py). With it, repeat calls are
    plan-construction-only and the session holds ONE pinned copy per
    distinct (input, ordering).
    """
    spark = df.sparkSession
    npart = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    return memo_local_checkpoint(
        df.repartitionByRange(npart, *order_cols)
        .withColumn(_PID, F.spark_partition_id()),
        eager=True,
    )


def _prefix_offsets(counts: dict[int, int], npart: int) -> tuple[list, int]:
    """Exclusive prefix sums over partition-id order; absent (empty)
    partitions contribute 0.  Returns (offsets_by_pid, grand_total)."""
    offsets, cum = [], 0
    for pid in range(npart):
        offsets.append(cum)
        cum += counts.get(pid, 0)
    return offsets, cum


def _offset_col(offsets: list) -> Column:
    # element_at is 1-based; offsets list is indexed by partition id
    return F.element_at(
        F.array(*[F.lit(int(v)).cast("long") for v in offsets]),
        F.col(_PID) + 1,
    )


def ranked_total(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str,
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact global ``row_number() OVER (ORDER BY order_cols)`` without
    a single-partition window.  Returns ``(df + rank_col (long), total
    row count)``.  Build-time cost: one bounded job (checkpoint + a
    num_partitions-row collect)."""
    part = _range_checkpoint(df, order_cols, num_partitions)
    npart = part.rdd.getNumPartitions()
    counts = {
        r[_PID]: r["cnt"]
        for r in part.groupBy(_PID).agg(F.count("*").alias("cnt")).collect()
    }
    offsets, total = _prefix_offsets(counts, npart)
    local = F.row_number().over(W.partitionBy(_PID).orderBy(*order_cols))
    out = part.withColumn(
        rank_col, (_offset_col(offsets) + local).cast("long")
    ).drop(_PID)
    return out, total


def running_sum_total(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    out_col: str,
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact inclusive running total ``sum(value) OVER (ORDER BY
    order_cols ROWS UNBOUNDED PRECEDING)`` as a distributed prefix sum.
    ``value_col`` must be integral (the offsets are collected exactly).
    Returns ``(df + out_col (long), grand total)``."""
    part = _range_checkpoint(df, order_cols, num_partitions)
    npart = part.rdd.getNumPartitions()
    sums = {
        r[_PID]: int(r["s"])
        for r in part.groupBy(_PID)
        .agg(F.sum(value_col).cast("long").alias("s"))
        .collect()
        if r["s"] is not None
    }
    offsets, total = _prefix_offsets(sums, npart)
    local = F.sum(value_col).over(
        W.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = part.withColumn(
        out_col, (_offset_col(offsets) + local).cast("long")
    ).drop(_PID)
    return out, total


def ntile_expr(rank_col: str, total: int, k: int) -> Column:
    """``ntile(k)`` reconstructed from an exact global rank: the first
    ``total % k`` buckets hold ``total//k + 1`` rows, the rest
    ``total//k`` — the SQL-standard sizing Spark and DuckDB both use,
    so bucket assignment is bit-identical to the window function."""
    size, rem = divmod(total, k)
    r = F.col(rank_col)
    if size == 0:  # fewer rows than buckets: every row its own bucket
        return r.cast("int")
    threshold = rem * (size + 1)
    return (
        F.when(r <= threshold, F.floor((r - 1) / (size + 1)) + 1)
        .otherwise(rem + F.floor((r - threshold - 1) / size) + 1)
        .cast("int")
    )
