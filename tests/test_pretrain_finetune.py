"""Pretrain → fine-tune workflows + label-efficiency sweep end to end."""

import os

import numpy as np
import pytest

from ich_tpu.data import synthetic_ich_slices, synthetic_rsna_slices
from ich_tpu.experiments.pretrain_finetune import (

    label_efficiency_sweep,
    pretrain_classifier,
    pretrain_context_restoration,
    pretrain_contrastive,
    run_supervised_2d_with_init,
)

pytestmark = pytest.mark.slow  # end-to-end: excluded from the fast subset


def _cfg(tmp_path, name="ssl"):
    return {
        "exp_name": name,
        "path": {"DATA": str(tmp_path / "d"), "OUTPUT": str(tmp_path / "o")},
        "seed": 0,
        "data": {"win_center": 50, "win_width": 200, "size": 32,
                 "augmentation": {"train": {}, "eval": {}}},
        "dataset": {"frac_negative": 2},
        "split": {"n_fold": 2, "shuffle": True},
        "net": {"depth": 3, "top_filter": 4, "midchannels_factor": 1, "p_dropout": 0.0},
        "corruption": {"n_swap": 3, "swap_w": (4, 8), "swap_h": (4, 8), "rotate": False},
        "train": {"loss_fn": "BinaryDiceLoss",
                  "loss_fn_kwargs": {"reduction": "mean", "p": 2, "alpha": 0.2},
                  "n_epoch": 1, "batch_size": 8, "lr": 1e-3, "validate_epoch": False},
    }


def _folds(k):
    return (
        synthetic_ich_slices(16, 32, 2, seed=k),
        synthetic_ich_slices(16, 32, 2, seed=40 + k),
    )


def test_context_restoration_to_finetune(tmp_path):
    cfg = _cfg(tmp_path, "cr")
    ssl_data = synthetic_ich_slices(16, 32, 2, seed=9)
    weights = pretrain_context_restoration(cfg, ssl_data)
    assert "params" in weights
    pre_dir = os.path.join(cfg["path"]["OUTPUT"], "cr", "pretrain")
    assert os.path.exists(os.path.join(pre_dir, "pretrained.bin"))
    out = run_supervised_2d_with_init(cfg, weights, _folds)
    assert os.path.exists(os.path.join(out, "average_scores.txt"))
    # fine-tune logs mention the weight transfer
    log = open(os.path.join(out, "Fold_1/log.txt")).read()
    assert "matching weight keys" in log


def test_contrastive_global_local(tmp_path):
    from ich_tpu.ops import transforms as T

    cfg = _cfg(tmp_path, "con")
    cfg["net"]["MLP_head"] = [16, 8]
    cfg["local"] = {"n_decoder": 1, "head_channel": (8, 4), "K": 2,
                    "n_region": 4, "n_epoch": 1, "freeze": True}
    data = synthetic_ich_slices(16, 32, 2, seed=3)
    # distinct global/local view pipelines (ADVICE r4 item 3: the local
    # phase must honor the override, not fall back to the trainer default)
    weights = pretrain_contrastive(
        cfg, data,
        aug_pipeline=T.Compose(T.RandomCropResize((0.4, 0.8)), T.HFlip(0.5)),
        local_aug_pipeline=T.Compose(T.RandomCropResize((0.7, 1.0))),
    )
    assert any("encoder" in str(k) for k in weights["params"])
    assert any("decoder" in str(k) for k in weights["params"])
    assert os.path.exists(
        os.path.join(cfg["path"]["OUTPUT"], "con", "pretrain_local", "pretrained.bin")
    )
    # the local-phase weights seed a UNet fine-tune (the bench's 4th arm
    # path): encoder AND partial-decoder stages must transfer
    out = run_supervised_2d_with_init(cfg, weights, _folds)
    log = open(os.path.join(out, "Fold_1/log.txt")).read()
    assert "matching weight keys" in log


def test_classifier_pretraining(tmp_path):
    cfg = _cfg(tmp_path, "clf")
    cfg["net"]["MLP_head"] = [16]
    ds = synthetic_rsna_slices(n_slices=16, size=32, seed=5)
    weights = pretrain_classifier(cfg, ds, multi=False)
    assert "params" in weights
    w_multi = pretrain_classifier({**cfg, "exp_name": "clfm"}, ds, multi=True)
    assert "params" in w_multi


def test_label_efficiency_sweep(tmp_path):
    cfg = _cfg(tmp_path, "sweep")
    results = label_efficiency_sweep(cfg, None, _folds, fractions=(0.5, 1.0))
    assert set(results) == {0.5, 1.0}
    for frac, out in results.items():
        assert os.path.exists(os.path.join(out, "average_scores.txt"))
    # the 50% run used fewer training patients: check logged split sizes differ
    assert results[0.5] != results[1.0]


def test_low_label_recipe_modifies_only_low_fractions(monkeypatch):
    """The rescue recipe (frac_negative cap + epoch stretch — reference
    ``UNet2D_scripts.py:121-123`` analog) must apply only below the
    threshold and leave other fractions byte-identical."""
    import ich_tpu.experiments.pretrain_finetune as pf

    seen = {}

    def fake_run(cfg, pre, folds):
        seen[cfg["dataset"]["label_fraction"]] = cfg
        return f"out_{cfg['exp_name']}"

    monkeypatch.setattr(pf, "run_supervised_2d_with_init", fake_run)
    cfg = {"exp_name": "x", "train": {"n_epoch": 40}, "dataset": {}}
    pf.label_efficiency_sweep(
        cfg, None, None, fractions=(0.1, 0.25),
        low_label_recipe={"below": 0.15, "frac_negative": 0.25,
                          "epoch_mult": 2},
    )
    assert seen[0.1]["dataset"]["frac_negative"] == 0.25
    assert seen[0.1]["train"]["n_epoch"] == 80
    assert "frac_negative" not in seen[0.25]["dataset"]
    assert seen[0.25]["train"]["n_epoch"] == 40
    # default: no recipe, nothing changes
    seen.clear()
    pf.label_efficiency_sweep(cfg, None, None, fractions=(0.1,))
    assert "frac_negative" not in seen[0.1]["dataset"]
    assert seen[0.1]["train"]["n_epoch"] == 40
