"""Round-13 index/cluster-maintenance operators: the IVF hot-cell
rebalance and the incremental connected-components merge — the
behaviors their DuckDB oracles can't isolate (partition pruning on
the hot cell; merge semantics on adversarial synthetic graphs)."""

from pyspark.sql import functions as F

from iceberg_kafka_playgroud_spark.operators import dedup, similarity
from iceberg_kafka_playgroud_spark.plans.inspect import physical_plan


def _labels(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, component long")


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "d1 long, d2 long")


def test_incremental_merge_chains_across_old_components(spark):
    """A new node bridging two old components must merge them to the
    global min label; untouched components and new-only edges keep
    their own labels."""
    old = _labels(
        spark, [(1, 1), (2, 1), (10, 10), (11, 10), (20, 20), (21, 20)]
    )
    new = _pairs(spark, [(2, 100), (100, 10), (200, 201)])
    got = {
        r["doc_id"]: (r["component"], r["component_size"])
        for r in dedup.incremental_components_merge(old, new).collect()
    }
    assert got == {
        1: (1, 5),
        2: (1, 5),
        10: (1, 5),
        11: (1, 5),
        100: (1, 5),
        20: (20, 2),
        21: (20, 2),
        200: (200, 2),
        201: (200, 2),
    }


def test_incremental_merge_old_node_without_old_edges(spark):
    """An OLD doc that had no old-graph edges (absent from the
    labeling) entering via a new edge is a super-node of its own id —
    it must not be dropped or double-labeled."""
    old = _labels(spark, [(5, 5), (6, 5)])
    new = _pairs(spark, [(7, 6)])  # 7 never appeared in old labeling
    got = {
        r["doc_id"]: (r["component"], r["component_size"])
        for r in dedup.incremental_components_merge(old, new).collect()
    }
    assert got == {5: (5, 3), 6: (5, 3), 7: (5, 3)}


def test_incremental_merge_empty_new_batch(spark):
    """No new edges → yesterday's labeling verbatim."""
    old = _labels(spark, [(3, 3), (4, 3)])
    new = _pairs(spark, [])
    got = {
        r["doc_id"]: (r["component"], r["component_size"])
        for r in dedup.incremental_components_merge(old, new).collect()
    }
    assert got == {3: (3, 2), 4: (3, 2)}


def test_rebalance_reads_only_hot_partition(spark, sf_dir):
    """The split side of the rebalance must prune the on-disk index
    scan to the single hot cell's partition — the structural 'only its
    members are re-assigned' guarantee."""
    plan = physical_plan(similarity.ann_ivf_rebalance(spark, sf_dir))
    import re

    prunes = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    hot_prunes = [p for p in prunes if re.search(r"cell#\d+L? = \d+", p)]
    assert hot_prunes, f"no hot-cell partition filter in plan:\n{plan}"


def test_rebalance_output_shape(spark, sf_dir):
    """K_CELLS+1 rows, exactly two split halves keyed off the hot
    cell, shares summing to ~1e6, split ids collision-free."""
    rows = similarity.ann_ivf_rebalance(spark, sf_dir).collect()
    assert len(rows) == similarity.K_CELLS + 1
    split = [r for r in rows if r["split_from"] >= 0]
    kept = [r for r in rows if r["split_from"] == -1]
    assert len(split) == 2 and len(kept) == similarity.K_CELLS - 1
    assert {r["split_from"] for r in split} == {split[0]["split_from"]}
    assert all(
        r["cell"] == similarity.SPLIT_CELL_OFFSET + r["seed_id"]
        for r in split
    )
    assert all(r["cell"] == r["seed_id"] for r in kept)
    total = sum(r["n_vecs"] for r in rows)
    assert total == spark.read.parquet(
        f"{sf_dir}/embeddings.parquet"
    ).count()
    share = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= share <= 1_000_000


def test_ivf_footer_counts_match_scan(spark, sf_dir):
    """The rebalance's catalog-stats path (per-cell counts from the
    index files' parquet footers) must agree exactly with a full scan
    of the persisted index — metadata-only must never drift from data."""
    import os

    import pyarrow.parquet as pq

    index_dir, cent_ids, _ = similarity._ivf_index_on_disk(spark, sf_dir)
    footer = {}
    for d in os.listdir(index_dir):
        if not d.startswith("cell="):
            continue
        cdir = os.path.join(index_dir, d)
        footer[int(d.split("=", 1)[1])] = sum(
            pq.ParquetFile(os.path.join(cdir, f)).metadata.num_rows
            for f in os.listdir(cdir)
            if f.endswith(".parquet")
        )
    scanned = {
        r["cell"]: r["n"]
        for r in spark.read.parquet(index_dir)
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert footer == scanned
    # the hash-by-cell pre-write repartition must keep one file per cell
    for d in os.listdir(index_dir):
        if d.startswith("cell="):
            files = [
                f
                for f in os.listdir(os.path.join(index_dir, d))
                if f.endswith(".parquet")
            ]
            assert len(files) == 1, (d, files)


def test_copurchase_stats_match_edge_table(spark, sf_dir):
    """The graph stats fused into the co-purchase build's materializing
    job must equal independent aggregations over the edge table."""
    from iceberg_kafka_playgroud_spark.operators import advanced

    edges, n_edges, n_nodes = advanced._copurchase_stats(spark, sf_dir)
    assert n_edges == edges.count()
    assert (
        n_nodes
        == edges.select(
            F.explode(F.array("pa", "pb")).alias("p")
        ).distinct().count()
    )


def test_rebalance_scan_fallback_matches_footer_path(spark, sf_dir, monkeypatch):
    """When the driver cannot list the index directory POSIX-style
    (object-store deployments), the rebalance must fall back to the
    map-side-combined index scan and produce the identical result."""
    import os

    baseline = similarity.ann_ivf_rebalance(spark, sf_dir).collect()
    index_dir, _, _ = similarity._ivf_index_on_disk(spark, sf_dir)
    real_listdir = os.listdir

    def failing_listdir(path, *a, **kw):
        if str(path).startswith(index_dir):
            raise OSError("simulated non-POSIX index store")
        return real_listdir(path, *a, **kw)

    # the operator imports os lazily inside the function body, so
    # patching the shared os module object covers it
    monkeypatch.setattr("os.listdir", failing_listdir)
    fallback = similarity.ann_ivf_rebalance(spark, sf_dir).collect()
    assert sorted(map(tuple, fallback)) == sorted(map(tuple, baseline))


def test_rebalance_arrow_failure_takes_scan_fallback(
    spark, sf_dir, monkeypatch
):
    """A corrupt/truncated parquet footer raises pyarrow ArrowInvalid
    (not OSError); the rebalance must take the same Spark-scan
    fallback instead of hard-failing (r15 ADVICE fix)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    baseline = similarity.ann_ivf_rebalance(spark, sf_dir).collect()
    real_parquet_file = pq.ParquetFile
    index_dir, _, _ = similarity._ivf_index_on_disk(spark, sf_dir)

    def corrupt_footer(path, *a, **kw):
        if str(path).startswith(index_dir):
            raise pa.ArrowInvalid("simulated truncated footer")
        return real_parquet_file(path, *a, **kw)

    monkeypatch.setattr("pyarrow.parquet.ParquetFile", corrupt_footer)
    fallback = similarity.ann_ivf_rebalance(spark, sf_dir).collect()
    assert sorted(map(tuple, fallback)) == sorted(map(tuple, baseline))


def test_observed_n_changed_falls_back_when_unfulfilled(spark):
    """If the Observation is not fulfilled (e.g. a Spark version whose
    eager localCheckpoint no longer posts SQLExecutionEnd), the CC
    convergence check must fall back to an explicit filter+count
    instead of blocking forever in obs.get (r15 ADVICE fix)."""
    from pyspark.sql import Observation

    updated = spark.createDataFrame(
        [(1, 1, 1), (2, 2, 1), (3, 3, 2)], "node long, old_label long, label long"
    )
    # unattached Observation: _jo is None — the guard must not raise
    assert dedup._observed_n_changed(Observation(), updated) == 2
    # attached but never actioned: getRowOrEmpty is empty — the count
    # fallback (which itself fulfills the observation) must be taken
    obs = Observation()
    observed = updated.observe(
        obs,
        F.sum(
            F.when(F.col("label") != F.col("old_label"), 1).otherwise(0)
        ).alias("n_changed"),
    )
    assert dedup._observed_n_changed(obs, observed) == 2
