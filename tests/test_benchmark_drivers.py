"""Unit coverage for the benchmark drivers' host-side logic (no TPU):
pooled label-efficiency reporting and the train-step bench helpers."""

import json
import os
import sys

import numpy as np
import pytest

BENCH_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "benchmarks")
sys.path.insert(0, BENCH_DIR)


def test_pooled_report_merges_seed_runs(tmp_path, capsys):
    import label_efficiency_bench as B

    rng = np.random.default_rng(0)
    for seed in (42, 43):
        d = tmp_path / f"seed{seed}"
        d.mkdir()
        res = {
            arm: {str(f): rng.uniform(0, 1, B.N_FOLDS).tolist()
                  for f in B.FRACTIONS}
            for arm in ("scratch", "pretrained")
        }
        (d / "results.json").write_text(json.dumps(res))

    pooled = B.pooled_report(str(tmp_path))
    out = capsys.readouterr().out
    assert "pooled 2 runs" in out
    for frac in B.FRACTIONS:
        assert len(pooled["scratch"][str(frac)]) == 2 * B.N_FOLDS
    # table + figure artifacts written next to the runs
    assert (tmp_path / "label_efficiency_table.md").exists()


def test_report_handles_partial_fractions(tmp_path, capsys):
    import label_efficiency_bench as B

    res = {arm: {"0.25": [0.1, 0.2]} for arm in ("scratch", "pretrained")}
    B.report(res, str(tmp_path))
    out = capsys.readouterr().out
    assert "25%" in out and "10%" not in out


def test_pooled_report_mixes_two_and_three_arm_seeds(tmp_path, capsys):
    """Old two-arm seed dirs must pool next to new three-arm ones: the
    contrastive column's paired deltas only use seeds where contrastive AND
    scratch both ran (VERDICT r3 item 4 harness)."""
    import label_efficiency_bench as B

    rng = np.random.default_rng(1)

    def res(arms):
        return {arm: {str(f): rng.uniform(0, 1, B.N_FOLDS).tolist()
                      for f in B.FRACTIONS} for arm in arms}

    (tmp_path / "seed42").mkdir()
    (tmp_path / "seed42" / "results.json").write_text(
        json.dumps(res(("scratch", "pretrained"))))
    (tmp_path / "seed43").mkdir()
    (tmp_path / "seed43" / "results.json").write_text(
        json.dumps(res(("scratch", "pretrained", "contrastive"))))

    pooled = B.pooled_report(str(tmp_path))
    out = capsys.readouterr().out
    assert "contrastive" in out
    # scratch pools both seeds; contrastive only came from seed43
    assert len(pooled["scratch"]["0.1"]) == 2 * B.N_FOLDS
    assert len(pooled["contrastive"]["0.1"]) == B.N_FOLDS
    # the CR arm pairs over both seeds (n=10), contrastive over one (n=5)
    row10 = next(ln for ln in out.splitlines() if ln.startswith("| 10%"))
    assert f"(n={2 * B.N_FOLDS}," in row10 and f"(n={B.N_FOLDS}," in row10


def test_report_arm_missing_fraction_renders_placeholder(tmp_path, capsys):
    """An arm lacking a fraction that scratch has (e.g. pooling a rescue-only
    arm next to the full sweep) must render placeholder cells, not KeyError
    (ADVICE r4 item 1)."""
    import label_efficiency_bench as B

    res = {
        "scratch": {"0.1": [0.1, 0.2], "0.25": [0.3, 0.4]},
        "pretrained": {"0.1": [0.2, 0.3]},  # no 0.25 entry
    }
    B.report(res, str(tmp_path))
    out = capsys.readouterr().out
    row25 = next(ln for ln in out.splitlines() if ln.startswith("| 25%"))
    assert "—" in row25
    row10 = next(ln for ln in out.splitlines() if ln.startswith("| 10%"))
    assert "n=2" in row10


def test_pooled_report_contrastive_local_arm(tmp_path, capsys):
    """The round-5 local(+global) contrastive arm pools and pairs like the
    others (VERDICT r4 item 1 harness)."""
    import label_efficiency_bench as B

    rng = np.random.default_rng(2)

    def res(arms):
        return {arm: {str(f): rng.uniform(0, 1, B.N_FOLDS).tolist()
                      for f in B.FRACTIONS} for arm in arms}

    (tmp_path / "seed42").mkdir()
    (tmp_path / "seed42" / "results.json").write_text(json.dumps(
        res(("scratch", "pretrained", "contrastive", "contrastive_local"))))
    pooled = B.pooled_report(str(tmp_path))
    out = capsys.readouterr().out
    assert "contrastive+local" in out
    assert len(pooled["contrastive_local"]["0.1"]) == B.N_FOLDS


def test_contrastive_local_pretrainer_registered():
    import label_efficiency_bench as B

    assert "contrastive_local" in B.PRETRAINERS
    assert "contrastive_local" in B.ARM_LABELS


def test_subsample_negative_slices_keeps_all_positives():
    import label_efficiency_bench as B
    from ich_tpu.data.core import SliceDataset2D

    n = 40
    masks = np.zeros((n, 4, 4), np.float32)
    masks[::4, 1, 1] = 1.0  # 10 positive slices
    ds = SliceDataset2D(np.zeros((n, 4, 4), np.float32), masks,
                        np.arange(n) // 8, np.arange(n))
    sub = B.subsample_negative_slices(ds, 0.25, np.random.default_rng(0))
    pos = sub.masks.reshape(len(sub), -1).sum(axis=1) > 0
    assert int(pos.sum()) == 10  # every positive kept
    assert len(sub) - 10 == round(0.25 * 30)  # 25% of the 30 negatives


@pytest.mark.slow
def test_fold_walltime_bench_tiny(tmp_path, monkeypatch, capsys):
    """fold_walltime_bench end to end at toy scale: the attribution record
    must balance (train + eval + build = fold wall) and parse real logs."""
    import fold_walltime_bench as FW

    monkeypatch.setattr(FW, "SIZE", 32)
    monkeypatch.setattr(FW, "N_PATIENTS", 5)
    monkeypatch.setattr(FW, "SLICES_PER_PATIENT", 8)
    FW.main(str(tmp_path), n_epoch=1)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["metric"] == "supervised_fold_walltime"
    ex = rec["extra"]
    assert ex["n_train"] == 32 and ex["n_test"] == 8
    assert ex["n_steps"] == 2  # ceil(32/16) * 1 epoch
    assert ex["sol_step_ms"] > 0 and ex["sol_fold_s"] > 0
    # attribution sums to the fold wall (within rounding)
    total = ex["train_wall_s"] + ex["final_eval_s"] + ex["build_init_artifacts_s"]
    assert abs(total - rec["value"]) < 1.0
    assert ex["epoch_s_mean"] is not None


def test_watchdog_fires_json_line_and_exits(tmp_path, monkeypatch, capsys):
    """The watchdog's fire path is the round-3 postmortem contract: a hung
    tunnel must still produce the ONE JSON line (with last_measured) and a
    hard exit. Also: pet() past the TOTAL deadline clamps, so the hard cap
    is honored no matter how often a slow run re-arms."""
    import importlib.util
    import os as _os
    import threading

    spec = importlib.util.spec_from_file_location(
        "bench_mod_wd", os.path.join(REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    fired = threading.Event()
    codes = []
    monkeypatch.setattr(_os, "_exit", lambda c: (codes.append(c), fired.set()))
    monkeypatch.setattr(bench._Watchdog, "TOTAL", 0.2)

    wd = bench._Watchdog(0.05)
    wd.pet(9999)  # re-arm far past the deadline: must clamp to the cap
    assert fired.wait(5.0), "watchdog never fired"
    wd.cancel()
    assert codes == [2]
    line = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()][-1]
    rec = json.loads(line)
    assert rec["value"] == 0.0 and "WATCHDOG" in rec["unit"]
    assert "last_measured" in rec["extra"]


def test_ca_profile_driver_imports_and_refuses_cpu(monkeypatch):
    """The CA-profile TPU driver must import cleanly (API-drift canary) and
    refuse to bench on a non-TPU platform."""
    import pytest

    import ca_profile

    monkeypatch.setattr(sys, "argv", ["ca_profile"])
    with pytest.raises(SystemExit, match="platform"):
        ca_profile.main()


def test_chunk_shape_probe_imports_and_refuses_cpu(monkeypatch):
    """The chunk-plan TPU probe must import cleanly (API-drift canary) and
    refuse to bench on a non-TPU platform."""
    import pytest

    import chunk_shape_probe

    monkeypatch.setattr(sys, "argv", ["chunk_shape_probe"])
    with pytest.raises(SystemExit, match="platform"):
        chunk_shape_probe.main()


REPO = os.path.dirname(BENCH_DIR)


def test_last_recorded_bench_skips_failed_rounds(tmp_path, monkeypatch):
    """Round 3's capture is `parsed: null` (tunnel outage): the fallback
    reporter must skip it and surface the newest round with a real value."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    (tmp_path / "BENCH_r01.json").write_text(json.dumps(
        {"parsed": {"value": 1.5, "unit": "volumes/s", "vs_baseline": 10}}))
    (tmp_path / "BENCH_r02.json").write_text(json.dumps(
        {"parsed": {"value": 4.25, "unit": "volumes/s", "vs_baseline": 782}}))
    (tmp_path / "BENCH_r03.json").write_text(json.dumps(
        {"rc": 1, "parsed": None}))
    monkeypatch.setattr(os.path, "abspath",
                        lambda p: str(tmp_path / "bench.py"))
    rec = bench._last_recorded_bench()
    assert rec is not None
    assert rec["value"] == 4.25 and rec["from"] == "BENCH_r02.json"


def test_bench_failure_still_emits_json_line():
    """Round 3's driver capture was `parsed: null` because a dead tunnel's
    backend-init RuntimeError escaped main(). Force the same class of
    failure (unknown jax platform) and require the ONE JSON line anyway."""
    import subprocess

    # drop /root/.axon_site from PYTHONPATH: its sitecustomize force-loads
    # the axon plugin (overriding JAX_PLATFORMS) and then BLOCKS on the
    # single-client TPU tunnel — without it the unknown platform fails fast
    env = os.environ | {"JAX_PLATFORMS": "__no_such_platform__",
                        "PYTHONPATH": ""}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines, proc.stderr[-2000:]
    rec = json.loads(lines[-1])
    assert rec["metric"] == "ct_volumes_per_sec_per_chip_sliding_window"
    assert rec["value"] == 0.0
    assert "BENCH FAILED" in rec["unit"]
    # the real last-measured number rides along for the driver/judge
    lm = rec["extra"]["last_measured"]
    assert lm is not None and lm["value"] > 0
