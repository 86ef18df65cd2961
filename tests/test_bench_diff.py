"""Pins for tools/bench_diff.py (r15 verdict task 3): the
round-over-round adjudication protocol — structure first, probes
second, wall last — applied mechanically.  Pure-Python, no Spark."""

import importlib.util
import pathlib

_spec = importlib.util.spec_from_file_location(
    "bench_diff",
    pathlib.Path(__file__).resolve().parent.parent
    / "tools"
    / "bench_diff.py",
)
bench_diff = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench_diff)


def _detail(queries, jobs, probe_start, probe_mid, **extra):
    return {
        "metric": "headline_queries_detail",
        "queries_recompute": queries,
        "queries_jobs_recompute": jobs,
        "calibration_probe": {
            "rows": 10_000_000,
            "start": probe_start,
            "mid": probe_mid,
            "end": [0.05],
        },
        "duckdb_queries": {k: 0.1 for k in queries},
        **extra,
    }


OLD = _detail(
    {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0},
    {"a": [4, 4], "b": [4, 4], "c": [4, 4], "d": [4, 4]},
    [0.05, 0.06],
    [0.05, 0.07],
)


def _verdicts(old, new):
    rows, summary = bench_diff.adjudicate(old, new)
    return {r["query"]: r["verdict"] for r in rows}, summary


def test_flat_within_band():
    new = _detail(
        {"a": 1.1, "b": 0.9, "c": 1.0, "d": 1.0},
        OLD["queries_jobs_recompute"],
        [0.05],
        [0.05],
    )
    v, _ = _verdicts(OLD, new)
    assert set(v.values()) == {"flat"}


def test_structure_first_plan_change_beats_probes():
    # grown job count => plan change even on a degraded box
    new = _detail(
        {"a": 2.0, "b": 1.0, "c": 1.0, "d": 1.0},
        {**OLD["queries_jobs_recompute"], "a": [7, 7]},
        [0.9],
        [0.8],
    )
    v, _ = _verdicts(OLD, new)
    assert v["a"] == "plan-change-regressed"


def test_probes_second_host_noise():
    # jobs flat, wall regressed, slower file's probe spiked => noise
    new = _detail(
        {"a": 2.0, "b": 1.0, "c": 1.0, "d": 1.0},
        OLD["queries_jobs_recompute"],
        [0.5, 0.6],
        [0.7],
    )
    v, _ = _verdicts(OLD, new)
    assert v["a"] == "host-noise"


def test_wall_last_genuine_regression_and_improvement():
    new = _detail(
        {"a": 2.0, "b": 0.4, "c": 1.0, "d": 1.0},
        OLD["queries_jobs_recompute"],
        [0.05],
        [0.06],
    )
    v, summary = _verdicts(OLD, new)
    assert v["a"] == "REGRESSION" and v["b"] == "improved"
    assert summary["verdict_counts"]["REGRESSION"] == 1


def test_burst_signature_cold_inversion():
    # slower file's cold beats its own best recompute rep => a burst
    # hit the rep section (the r15c ann_pq_adc_topk shape)
    new = _detail(
        {"a": 5.0, "b": 1.0, "c": 1.0, "d": 1.0},
        OLD["queries_jobs_recompute"],
        [0.05],
        [0.05],
        queries_runs_recompute={"a": [5.0, 7.9]},
        queries_cold={"a": 3.5},
    )
    v, _ = _verdicts(OLD, new)
    assert v["a"] == "host-noise"


def test_burst_signature_rep_overlap():
    # rep ranges overlap: the best-of delta is inside observed spread
    old = dict(OLD)
    old["queries_runs_recompute"] = {"a": [1.0, 1.7]}
    old["queries_cold"] = {"a": 2.0}
    new = _detail(
        {"a": 1.6, "b": 1.0, "c": 1.0, "d": 1.0},
        OLD["queries_jobs_recompute"],
        [0.05],
        [0.05],
        queries_runs_recompute={"a": [1.6, 2.4]},
        queries_cold={"a": 3.0},
    )
    v, _ = _verdicts(old, new)
    assert v["a"] == "flat"


def test_pre_r15_files_lack_jobs():
    old = dict(OLD)
    old.pop("queries_jobs_recompute")
    new = _detail(
        {"a": 2.0, "b": 1.0, "c": 1.0, "d": 1.0},
        {},
        [0.05],
        [0.05],
    )
    v, _ = _verdicts(old, new)
    # within-band rows without a fingerprint are flat-no-jobs, never
    # a bare "flat" (r16 ADVICE: "flat" would imply a structural
    # adjudication that never happened)
    assert v["a"] == "no-jobs-data" and v["b"] == "flat-no-jobs"
    assert "flat" not in v.values()


def test_regime_mismatch_refuses_to_adjudicate():
    # a pre-r12 cache-warm detail file must not be silently compared
    # against a recompute-warm one — the columns measure different work
    import pytest

    old = dict(OLD)  # no markers => cache_warm
    new = _detail(
        {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0},
        OLD["queries_jobs_recompute"],
        [0.05],
        [0.05],
        ratio_semantics="recompute_warm",
    )
    with pytest.raises(SystemExit, match="regime mismatch"):
        bench_diff.adjudicate(old, new)
    # both marker spellings normalize to the same token
    newer = dict(new)
    newer.pop("ratio_semantics")
    newer["queries_regime"] = "recompute_warm_since_r12"
    v, _ = _verdicts(new, newer)
    assert set(v.values()) == {"flat"}


def test_added_and_removed_queries():
    new = _detail(
        {"a": 1.0, "b": 1.0, "c": 1.0, "e": 1.0},
        {k: [4, 4] for k in ("a", "b", "c", "e")},
        [0.05],
        [0.05],
    )
    v, _ = _verdicts(OLD, new)
    assert v["e"] == "new-query" and v["d"] == "removed-query"


def test_fallback_job_jitter_is_not_plan_change():
    # equal minima with a small positive tail = runtime jitter
    # (AQE re-optimization / broadcast-job scheduling adding a small
    # job on one rep — observed once on dedup_incremental_cc; the
    # listener-lag/fallback theory was instrumented and refuted in
    # r16), not a new plan
    old = dict(OLD)
    old["queries_jobs_recompute"] = {**OLD["queries_jobs_recompute"], "a": [69, 69]}
    new = _detail(
        {"a": 1.05, "b": 1.0, "c": 1.0, "d": 1.0},
        {**OLD["queries_jobs_recompute"], "a": [69, 70]},
        [0.05],
        [0.05],
    )
    rows, summary = bench_diff.adjudicate(old, new)
    byq = {r["query"]: r for r in rows}
    assert byq["a"]["verdict"] == "flat"
    # the tolerated tail is ANNOTATED, not silently absorbed (r16
    # ADVICE): row carries jobs_jitter and the summary lists it
    assert byq["a"].get("jobs_jitter") is True
    assert summary["jobs_jitter_rows"] == ["a"]
    assert not byq["b"].get("jobs_jitter")
    # different minima IS a plan change even with overlap in the sets
    new2 = _detail(
        {"a": 3.0, "b": 1.0, "c": 1.0, "d": 1.0},
        {**OLD["queries_jobs_recompute"], "a": [70, 70]},
        [0.05],
        [0.05],
    )
    v2, _ = _verdicts(old, new2)
    assert v2["a"] == "plan-change-regressed"


def test_rep_count_change_same_plan_is_not_plan_change():
    # 2 reps -> 3 reps with the same per-rep count: same fingerprint
    new = _detail(
        {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0},
        {k: [4, 4, 4] for k in ("a", "b", "c", "d")},
        [0.05],
        [0.05],
    )
    v, _ = _verdicts(OLD, new)
    assert set(v.values()) == {"flat"}


def test_probe_burst_reps_checkpoint_overlap_and_warmup_regimes():
    # r15c's real shape: checkpoint minima read healthy (min-based
    # reading discards the elevated tail reps) while a burst
    # OVERLAPPING both checkpoints leaves reps above the ceiling —
    # the burst-rep count surfaces exactly that.  Rep 0 is skipped on
    # pre-r17 files (systematic warmup, ~0.2-0.4 s in all six
    # committed snapshots, calm and degraded alike — no host signal).
    burst = _detail(
        {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0},
        OLD["queries_jobs_recompute"],
        [0.358, 0.126, 0.117],
        [0.350, 0.111, 0.124],
    )
    _, summary = bench_diff.adjudicate(burst, OLD)
    assert summary["probe_spark_section_old"] == 0.117  # min-healthy
    assert summary["probe_burst_reps_old"] == 2  # 0.126 + 0.124
    assert summary["probe_burst_reps_new"] == 0
    # the r16 record shape — warmup rep 0 inflated, tails clean — is
    # NOT a checkpoint-overlap burst (its q14 burst fell between
    # checkpoints; rule-3 signatures adjudicated it)
    record = _detail(
        {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0},
        OLD["queries_jobs_recompute"],
        [0.352, 0.083, 0.079],
        [0.279, 0.089, 0.101],
    )
    _, s_rec = bench_diff.adjudicate(record, OLD)
    assert s_rec["probe_burst_reps_old"] == 0
    # r17+ files mark warmup_discarded: every recorded rep is steady
    # state and rep 0 counts
    wd = _detail(
        {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0},
        OLD["queries_jobs_recompute"],
        [0.30, 0.05, 0.05],
        [0.05, 0.05],
    )
    wd["calibration_probe"]["warmup_discarded"] = True
    _, s_wd = bench_diff.adjudicate(wd, OLD)
    assert s_wd["probe_burst_reps_old"] == 1
    # files without calibration data report None, not 0
    old = dict(OLD)
    old.pop("calibration_probe")
    _, s2 = bench_diff.adjudicate(old, OLD)
    assert s2["probe_burst_reps_old"] is None
