"""Scale-growth smoke: measured evidence that the data-heavy operator
plans are ~linear in corpus size, not quadratic.

Builds a 10× documents corpus (10 salted copies of the sf0.1 fixture —
salting the text prevents cross-copy near-dups, so the workload is a
genuine 10× of the same shape) and asserts wall-time for the top
data-heavy operators grows ≤ LINEAR_SLACK × 10. A quadratic candidate
path (e.g. a hot LSH bucket) would show ~100× growth and fail loudly.

Gated behind SPARK_GRAFT_PERF=1 — it's a ~2 min timing test, not a
correctness gate. Results table lives in NOTES.md.
"""

from __future__ import annotations

import os
import shutil
import time

import pytest

from pyspark.sql import functions as F

PERF = os.environ.get("SPARK_GRAFT_PERF") == "1"
pytestmark = pytest.mark.skipif(
    not PERF, reason="timing test; set SPARK_GRAFT_PERF=1 to run"
)

SRC_SF = "/root/testdata/sf0.1"
COPIES = 10
# 10× data may grow ≤ this × the 1× time: generous for Spark's fixed
# per-stage floor and co-tenant noise, far below the ~100× a
# quadratic path would show
LINEAR_SLACK = 2.5


@pytest.fixture(scope="module")
def scaled_dir(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("scale10"))
    d = spark.read.parquet(f"{SRC_SF}/documents.parquet")
    copies = [
        d.select(
            (F.col("doc_id") + F.lit(i * 100_000_000)).alias("doc_id"),
            *[c for c in d.columns if c not in ("doc_id", "text")],
            F.concat(F.lit(f"u{i}x "), F.col("text")).alias("text"),
        ).select(*d.columns)
        for i in range(COPIES)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.repartition(32).write.mode("overwrite").parquet(
        f"{base}/documents.parquet"
    )
    yield base
    shutil.rmtree(base, ignore_errors=True)


def _ops():
    from iceberg_kafka_playgroud_spark.operators import (
        curation,
        dedup,
        multimodal,
        text,
    )

    return {
        "dedup_minhash_lsh": dedup.dedup_minhash_lsh,
        "dedup_simhash_hamming": dedup.dedup_simhash_hamming,
        "dedup_connected_components": dedup.dedup_connected_components,
        "dedup_cluster_canonical": dedup.dedup_cluster_canonical,
        "text_quality_score": text.text_quality_score,
        "text_lang_id": text.text_lang_id,
        "text_bigram_logprob": text.text_bigram_logprob,
        "multimodal_phash_near_dup": multimodal.multimodal_phash_near_dup,
        # round-6 continuation heavies (documents-only, so they run
        # against the same scaled fixture)
        "text_bm25_retrieval": text.text_bm25_retrieval,
        "bpe_train_merges": text.bpe_train_merges,
        "chunk_exact_dedup": curation.chunk_exact_dedup,
        # round-7 second-wave heavies (documents-only)
        "text_boilerplate_coverage": text.text_boilerplate_coverage,
        "dedup_minhash_calibration": dedup.dedup_minhash_calibration,
        # round-8 heavies (documents-only).  NB on dedup_weighted_jaccard
        # (and every candidate-scoring op here): the salted 10× corpus
        # makes each doc a near-dup of its 9 siblings, so the CANDIDATE
        # workload grows ~417× (702 → 293,124 pairs at sf0.1), not 10× —
        # wall-clock ratios for candidate-bound ops measure real extra
        # near-dups to score, not plan defects.  weighted_jaccard at
        # ~5-6× wall for 417× candidates is strongly sublinear per pair;
        # its r10 rewrite additionally prunes the df aggregate to
        # candidate shingles (gated broadcast semi-join) so the IDF pass
        # stops scaling with the corpus vocabulary.
        "dedup_weighted_jaccard": dedup.dedup_weighted_jaccard,
        "dedup_chunk_stitch_audit": dedup.dedup_chunk_stitch_audit,
        "text_pmi_bigrams": text.text_pmi_bigrams,
        "text_feature_hashing": text.text_feature_hashing,
        # round-12: the hashed-linear classifier gate (full-corpus
        # token explode + doc-keyed integer aggregate)
        "quality_classifier_gate": text.quality_classifier_gate,
    }


def _clear_engine_memos() -> None:
    """Forget the engine's session-keyed materialization memos (CC
    labels, pinned range partitionings, trade edges): the growth claim
    is about the COLD dataflow, and a memo hit is corpus-size-
    insensitive just like a cache hit.  The actual clear list lives in
    ``plan_cache.clear_materializations`` — ONE inventory shared with
    bench.py's recompute-warm column, so a new memo added to the
    engine cannot silently stay warm in just one of the harnesses."""
    from iceberg_kafka_playgroud_spark import plan_cache as _pc

    _pc.clear_materializations()


def _best_of(fn, spark, sf_dir, n=2):
    best = float("inf")
    for _ in range(n):
        # drop the plan-keyed caches (pair graphs, signature tables):
        # the growth claim is about the COLD dataflow, and a cached
        # re-read is corpus-size-insensitive
        spark.catalog.clearCache()
        _clear_engine_memos()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def test_data_heavy_ops_grow_linearly(spark, scaled_dir):
    rows = []
    for name, fn in _ops().items():
        t1 = _best_of(fn, spark, SRC_SF)
        t10 = _best_of(fn, spark, scaled_dir)
        ratio = t10 / t1
        rows.append((name, t1, t10, ratio))
    table = "\n".join(
        f"  {n:<30} 1x={a:6.2f}s 10x={b:6.2f}s ratio={r:5.1f}x"
        for n, a, b, r in rows
    )
    print("\nscale growth (10x corpus):\n" + table)
    bad = [(n, r) for n, _, _, r in rows if r > COPIES * LINEAR_SLACK]
    assert not bad, f"superlinear growth {bad}:\n{table}"


def test_no_cartesian_product_anywhere(spark):
    """Global plan hygiene: NONE of the registered queries may
    compile to a CartesianProduct — the one operator that is always
    wrong at 100 TB. (1-row scalar attaches compile to
    BroadcastNestedLoopJoin with a single-row build side, which is
    constant-cost and allowed.) Gated with the perf tests: building
    every plan takes ~2-3 min because a few operators run driver
    loops at plan time."""
    import __spark_entry__ as e
    from iceberg_kafka_playgroud_spark.plans.inspect import physical_plan

    offenders = []
    for name, fn in e.queries().items():
        plan = physical_plan(fn(spark, SRC_SF.replace("sf0.1", "sf0.001")))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"


@pytest.fixture(scope="module")
def scaled_events_dir(spark, tmp_path_factory):
    """10× events corpus: 10 id-shifted copies (disjoint user/event id
    ranges, identical temporal shape) — every per-user series keeps
    its per-copy activity profile, so user-keyed operators face a
    genuine 10× of the same workload shape; day-keyed operators see
    10× rows per day."""
    from iceberg_kafka_playgroud_spark.schema import load_table

    base = str(tmp_path_factory.mktemp("scale10ev"))
    e = load_table(spark, SRC_SF, "events")
    shift = 1_000_000_000
    copies = [
        e.select(
            (F.col("event_id") + F.lit(i * shift)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(i * shift)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for i in range(COPIES)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.repartition(32).write.mode("overwrite").parquet(
        f"{base}/events.parquet"
    )
    yield base
    shutil.rmtree(base, ignore_errors=True)


def _event_ops():
    from iceberg_kafka_playgroud_spark.operators import advanced, temporal

    return {
        "event_sessionize_batch": advanced.event_sessionize_batch,
        "events_rolling_distinct_users": temporal.events_rolling_distinct_users,
        "join_asof_forward": advanced.join_asof_forward,
        "events_cohort_retention": advanced.events_cohort_retention,
        "events_seasonality_dow": temporal.events_seasonality_dow,
        "user_activity_streaks": advanced.user_activity_streaks,
        "session_funnel": advanced.session_funnel,
        # round-8: cogrouped-pandas as-of (user-keyed shuffle + pandas)
        "cogroup_asof_attribution": advanced.cogroup_asof_attribution,
    }


def test_event_ops_grow_linearly(spark, scaled_events_dir):
    rows = []
    for name, fn in _event_ops().items():
        t1 = _best_of(fn, spark, SRC_SF)
        t10 = _best_of(fn, spark, scaled_events_dir)
        ratio = t10 / t1
        rows.append((name, t1, t10, ratio))
    table = "\n".join(
        f"  {n:<30} 1x={a:6.2f}s 10x={b:6.2f}s ratio={r:5.1f}x"
        for n, a, b, r in rows
    )
    print("\nevents scale growth (10x corpus):\n" + table)
    bad = [(n, r) for n, _, _, r in rows if r > COPIES * LINEAR_SLACK]
    assert not bad, f"superlinear growth {bad}:\n{table}"


# The ONLY queries (of all 268) whose physical plan contains an
# unpartitioned ordered Window — each with the frame collapsed to a
# constant- or slowly-growing cardinality BEFORE the window, so no
# task ever sees a data-sized frame. Exhaustive by construction: the
# sweep below fails the moment a new operator adds one.
GLOBAL_WINDOW_BOUNDED_OK = {
    # snapshot-metadata frame (one row per commit; expire-bounded)
    "stream_snapshot_ingest",
    # calendar-day-collapsed frames (cardinality = days in span,
    # bounded by the calendar even over decades; each docstring
    # documents the collapse happening BEFORE the window)
    "time_gapfill_locf", "time_gapfill_interpolate",
    "orders_open_concurrency", "events_changepoint_cusum",
    "events_daily_growth",
    # horizon-truncated frames (TakeOrderedAndProject to a constant
    # before the rank window; plan-pinned in test_plans.py)
    "hybrid_rrf_retrieval",
    # constant-R frame: vocabulary collapsed to ZIPF_TOP_R=256 rows by
    # orderBy().limit() BEFORE the rank window
    "text_zipf_slope",
    # survival table lives on DISTINCT reorder-interval day values —
    # calendar-bounded cardinality (≤ days in the date span)
    "orders_survival_hazard",
    # cell-counts frame: corpus collapsed to K_CELLS=16 rows by the
    # cell-keyed aggregate BEFORE the share/rank windows
    "ann_ivf_balance_audit",
}


def test_no_unbounded_global_window_anywhere(spark):
    """Global plan hygiene, round-7 extension of the cartesian sweep:
    any query whose physical plan contains an UNPARTITIONED Window
    must be in the documented-bounded whitelist above (frame collapsed
    to constant/slow-growing cardinality before the window) — a new
    operator that single-partitions a data-sized frame fails here
    before it ever reaches a scale run."""
    import re as _re

    import __spark_entry__ as e
    from iceberg_kafka_playgroud_spark.plans.inspect import physical_plan

    def unpartitioned_windows(plan: str) -> int:
        # Window Arguments print as [funcs], [partitionSpec], [orderSpec]
        # with EMPTY specs omitted: 3 groups = partitioned+ordered,
        # 2 groups = partition-only (last group has no sort direction)
        # OR order-only global window (last group has ASC/DESC) — only
        # the latter funnels data through one task.
        count = 0
        for b in _re.split(r"\n\(\d+\) ", plan):
            # exact node match: WindowGroupLimit (the per-partition
            # top-k pre-filter) also starts with "Window" but is
            # always partition-local
            if b.split("\n", 1)[0].strip() != "Window":
                continue
            m = _re.search(r"Arguments: (.*)", b)
            if not m:
                continue
            depth, spans, start = 0, [], None
            for i, ch in enumerate(m.group(1)):
                if ch == "[":
                    if depth == 0:
                        start = i
                    depth += 1
                elif ch == "]":
                    depth -= 1
                    if depth == 0:
                        spans.append(m.group(1)[start : i + 1])
            if len(spans) >= 3:
                continue  # partitioned + ordered
            last = spans[-1] if spans else ""
            if " ASC" in last or " DESC" in last:
                count += 1  # global ordered window
        return count

    offenders = []
    for name, fn in e.queries().items():
        if name in GLOBAL_WINDOW_BOUNDED_OK:
            continue
        plan = physical_plan(fn(spark, SRC_SF.replace("sf0.1", "sf0.001")))
        n = unpartitioned_windows(plan)
        if n:
            offenders.append((name, n))
    assert not offenders, (
        "unpartitioned data-sized windows (add a PARTITION BY, a "
        f"bounding truncation, or a documented whitelist entry): {offenders}"
    )


@pytest.fixture(scope="module")
def scaled_embeddings_dir(spark, tmp_path_factory):
    """10× embedding corpus: 10 vec_id-shifted copies, each with a
    copy-specific SIGN-FLIP pattern over the dimensions. A shared flip
    pattern preserves every within-copy dot product exactly (s_i² = 1),
    so each copy is a geometry-identical replica of the original
    workload, while differing patterns decorrelate vectors ACROSS
    copies (expected cross-copy cosine ≈ 0) — a genuine 10× of the
    same ANN/near-dup shape with no artificial cross-copy duplicate
    explosion."""
    from iceberg_kafka_playgroud_spark.schema import load_table

    base = str(tmp_path_factory.mktemp("scale10emb"))
    em = load_table(spark, SRC_SF, "embeddings")
    copies = []
    for c in range(COPIES):
        # flip dims where bit (i % 10) of a copy-keyed pattern is set:
        # deterministic, ~half the dims per copy pair differ
        pattern = c * 0x9E3779B1 & 0x3FF
        # bit (i % 10) of the copy-keyed pattern, via arithmetic
        # (shiftright needs a literal shift amount, not a Column)
        flip = F.transform(
            F.col("embedding"),
            lambda x, i: F.when(
                F.floor(
                    F.lit(pattern) / F.pow(F.lit(2.0), (i % 10).cast("double"))
                ).cast("long")
                % 2
                == 1,
                -x,
            ).otherwise(x),
        )
        copies.append(
            em.select(
                (F.col("vec_id") + F.lit(c * 100_000_000)).alias("vec_id"),
                flip.alias("embedding"),
                "label",
            )
        )
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.repartition(32).write.mode("overwrite").parquet(
        f"{base}/embeddings.parquet"
    )
    yield base
    shutil.rmtree(base, ignore_errors=True)


def _embedding_ops():
    from iceberg_kafka_playgroud_spark.operators import similarity

    return {
        "ann_topk_blocked": similarity.ann_topk_blocked,
        "ann_topk_ivf": similarity.ann_topk_ivf,
        "ann_pq_adc_topk": similarity.ann_pq_adc_topk,
        "ann_ivfpq_residual_topk": similarity.ann_ivfpq_residual_topk,
        "ann_mmr_rerank": similarity.ann_mmr_rerank,
        # embedding_near_dup_lsh is deliberately ABSENT: at its 0.45
        # cosine threshold (θ ≈ 63°, per-bit agreement 0.65) any
        # sign-LSH banding admits ~r/2^b · n²/2 random-pair
        # candidates — the LSH ρ-exponent is near 1 this close to
        # random, so candidate volume on a DECORRELATED 10× corpus is
        # intrinsically ~100×, by problem statement rather than plan
        # defect (measured: 1.7M → 171M candidates; the op's contract
        # is exact fixture parity + pinned full recall, and real
        # corpora dedup at far higher thresholds where banding prunes)
        "embedding_kmeans_lloyd": similarity.embedding_kmeans_lloyd,
        "dedup_semantic_semdedup": similarity.dedup_semantic_semdedup,
        # round-12: triplet mining (one broadcast corpus pass + an
        # anchor-keyed window; anchors stay fixed as the corpus grows)
        "embedding_triplet_mining": similarity.embedding_triplet_mining,
        # round-13: hot-cell rebalance — cost = the once-a-session
        # index build plus ONE cell partition's re-assignment, so
        # growth tracks the index build, never the split
        "ann_ivf_rebalance": similarity.ann_ivf_rebalance,
    }


def test_embedding_ops_grow_linearly(spark, scaled_embeddings_dir):
    rows = []
    for name, fn in _embedding_ops().items():
        t1 = _best_of(fn, spark, SRC_SF)
        t10 = _best_of(fn, spark, scaled_embeddings_dir)
        ratio = t10 / t1
        rows.append((name, t1, t10, ratio))
    table = "\n".join(
        f"  {n:<30} 1x={a:6.2f}s 10x={b:6.2f}s ratio={r:5.1f}x"
        for n, a, b, r in rows
    )
    print("\nembedding scale growth (10x corpus):\n" + table)
    bad = [(n, r) for n, _, _, r in rows if r > COPIES * LINEAR_SLACK]
    assert not bad, f"superlinear growth {bad}:\n{table}"


@pytest.fixture(scope="module")
def scaled_orders_dir(spark, tmp_path_factory):
    """10× orders/lineitem/customer corpus: 10 key-shifted copies with
    suppliers shifted too, so the trade graph becomes 10 disjoint
    geometry-identical replicas (same per-customer baskets, same
    reorder intervals, same per-community structure) — a faithful 10×
    of the orders-family workload. ``part`` is shared (same catalog)."""
    import os

    base = str(tmp_path_factory.mktemp("scale10ord"))
    shift = 100_000_000
    o = spark.read.parquet(f"{SRC_SF}/orders.parquet")
    li = spark.read.parquet(f"{SRC_SF}/lineitem.parquet")
    c = spark.read.parquet(f"{SRC_SF}/customer.parquet")

    def stack(df, keys):
        copies = [
            df.select(
                *[
                    (F.col(col) + F.lit(i * shift)).alias(col)
                    if col in keys
                    else F.col(col)
                    for col in df.columns
                ]
            )
            for i in range(COPIES)
        ]
        big = copies[0]
        for x in copies[1:]:
            big = big.unionByName(x)
        return big

    stack(o, {"o_orderkey", "o_custkey"}).repartition(32).write.parquet(
        f"{base}/orders.parquet"
    )
    stack(li, {"l_orderkey", "l_suppkey"}).repartition(32).write.parquet(
        f"{base}/lineitem.parquet"
    )
    stack(c, {"c_custkey"}).repartition(8).write.parquet(
        f"{base}/customer.parquet"
    )
    for shared in ("part", "supplier", "nation", "region"):
        os.symlink(
            f"{SRC_SF}/{shared}.parquet", f"{base}/{shared}.parquet"
        )
    yield base
    shutil.rmtree(base, ignore_errors=True)


def _orders_ops():
    from iceberg_kafka_playgroud_spark.operators import advanced

    from iceberg_kafka_playgroud_spark.operators import temporal

    return {
        "orders_survival_hazard": advanced.orders_survival_hazard,
        "basket_diversity_simpson": advanced.basket_diversity_simpson,
        "graph_label_propagation": advanced.graph_label_propagation,
        "orders_rfm_segmentation": advanced.orders_rfm_segmentation,
        # r12 verdict watch-item: the AQE-coalesced single-partition
        # day-delta reduce is fine at sf0.1 — prove it stays linear
        # as the orders fixture grows 10×
        "orders_open_concurrency": temporal.orders_open_concurrency,
    }


def test_orders_ops_grow_linearly(spark, scaled_orders_dir):
    rows = []
    for name, fn in _orders_ops().items():
        t1 = _best_of(fn, spark, SRC_SF)
        t10 = _best_of(fn, spark, scaled_orders_dir)
        ratio = t10 / t1
        rows.append((name, t1, t10, ratio))
    table = "\n".join(
        f"  {n:<30} 1x={a:6.2f}s 10x={b:6.2f}s ratio={r:5.1f}x"
        for n, a, b, r in rows
    )
    print("\norders scale growth (10x corpus):\n" + table)
    bad = [(n, r) for n, _, _, r in rows if r > COPIES * LINEAR_SLACK]
    assert not bad, f"superlinear growth {bad}:\n{table}"


# ---------------------------------------------------------------------------
# Incremental connected components: the merge of a FIXED new edge
# batch into an existing labeling must not re-pay the propagation
# loop over the old corpus (r12 verdict task 6).  Synthetic chain
# graph: full CC needs O(chain length) corpus-wide rounds, the
# incremental merge is a constant number of single passes — so at the
# SAME scale the merge must be decisively cheaper than re-clustering,
# and its own growth with old-corpus size stays ~linear (one-pass).


CHAIN_LEN = 8
N_CHAINS_1X = 20_000


def _chain_state(spark, n_chains):
    """(old_pairs, old_labels) for n_chains disjoint CHAIN_LEN-node
    chains; labels are the closed-form min-id labeling (yesterday's
    persisted state — no CC run needed to produce it)."""
    base = spark.range(n_chains).select(
        (F.col("id") * CHAIN_LEN).alias("base")
    )
    offs = F.explode(F.sequence(F.lit(0), F.lit(CHAIN_LEN - 2))).alias("j")
    pairs = base.select("base", offs).select(
        (F.col("base") + F.col("j")).alias("d1"),
        (F.col("base") + F.col("j") + 1).alias("d2"),
    )
    noffs = F.explode(F.sequence(F.lit(0), F.lit(CHAIN_LEN - 1))).alias("j")
    labels = base.select("base", noffs).select(
        (F.col("base") + F.col("j")).alias("doc_id"),
        F.col("base").alias("component"),
    )
    return pairs, labels


def test_incremental_cc_merge_beats_reclustering(spark):
    from iceberg_kafka_playgroud_spark.operators import dedup

    new_edges = spark.range(100).select(
        (F.col("id") * 2 * CHAIN_LEN).alias("d1"),
        ((F.col("id") * 2 + 1) * CHAIN_LEN).alias("d2"),
    )

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    rows = []
    for mult in (1, 10):
        pairs, labels = _chain_state(spark, N_CHAINS_1X * mult)
        pairs = pairs.repartition(32).localCheckpoint(eager=True)
        labels = labels.repartition(32).localCheckpoint(eager=True)
        union_pairs = pairs.unionByName(new_edges)
        t_merge = t_full = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            _clear_engine_memos()
            t0 = time.perf_counter()
            run(dedup.incremental_components_merge(labels, new_edges))
            t_merge = min(t_merge, time.perf_counter() - t0)
            spark.catalog.clearCache()
            _clear_engine_memos()
            t0 = time.perf_counter()
            run(dedup.connected_components_over(union_pairs))
            t_full = min(t_full, time.perf_counter() - t0)
        rows.append((mult, t_merge, t_full))
    table = "\n".join(
        f"  {m:>2}x old corpus: merge={tm:6.2f}s full_cc={tf:6.2f}s "
        f"({tf / tm:4.1f}x)"
        for m, tm, tf in rows
    )
    print("\nincremental CC vs re-clustering (fixed 100-edge batch):\n" + table)
    # at 10x the old corpus the merge must beat re-clustering clearly
    m10, merge10, full10 = rows[-1]
    assert merge10 < 0.6 * full10, table
    # and the merge itself grows ~linearly (single-pass class)
    growth = rows[-1][1] / rows[0][1]
    assert growth <= COPIES * LINEAR_SLACK, (
        f"merge growth {growth:.1f}x\n{table}"
    )
