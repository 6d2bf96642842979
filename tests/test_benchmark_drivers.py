"""Unit coverage for the benchmark drivers' host-side logic (no TPU):
pooled label-efficiency reporting and the train-step bench helpers."""

import json
import os
import sys

import numpy as np

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
    assert (tmp_path / "table.md").exists()


def test_report_handles_partial_fractions(tmp_path, capsys):
    import label_efficiency_bench as B

    res = {arm: {"0.25": [0.1, 0.2]} for arm in ("scratch", "pretrained")}
    B.report(res, str(tmp_path))
    out = capsys.readouterr().out
    assert "25%" in out and "10%" not in out


def test_pallas_gate_drivers_import_and_refuse_cpu(monkeypatch):
    """The two TPU gate drivers must import cleanly (API-drift canary for
    the queued hardware run) and refuse to bench on a non-TPU platform."""
    import pytest

    import pallas_conv_gate
    import pallas_in_net_ab

    for mod in (pallas_conv_gate, pallas_in_net_ab):
        monkeypatch.setattr(sys, "argv", [mod.__name__])
        with pytest.raises(SystemExit, match="platform"):
            mod.main()
