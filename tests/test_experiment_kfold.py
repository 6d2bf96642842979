"""End-to-end k-fold experiment driver on synthetic data."""

import json
import os

import numpy as np
import pytest

from ich_tpu.data import synthetic_ich_slices
from ich_tpu.experiments import run_supervised_2d

pytestmark = pytest.mark.slow  # end-to-end: excluded from the fast subset



def _cfg(tmp_path, n_fold=2):
    return {
        "exp_name": "synthetic_kfold",
        "path": {"DATA": str(tmp_path / "data"), "OUTPUT": str(tmp_path / "out")},
        "seed": 42,
        "print_progress": False,
        "data": {
            "win_center": 50, "win_width": 200, "size": 32,
            "augmentation": {
                "train": {"Rotate": {"low": -10, "high": 10}, "HFlip": {"p": 0.5}},
                "eval": {},
            },
        },
        "dataset": {"frac_negative": 2},
        "split": {"n_fold": n_fold, "shuffle": True},
        "net": {"depth": 3, "top_filter": 4, "3D": False, "in_channels": 1,
                "out_channels": 1, "bilinear": False, "midchannels_factor": 1,
                "p_dropout": 0.0},
        "train": {
            "model_path_to_load": None,
            "loss_fn": "BinaryDiceLoss",
            "loss_fn_kwargs": {"reduction": "mean", "p": 2, "alpha": 0.2},
            "n_epoch": 2, "batch_size": 8, "lr": 1e-3,
            "lr_scheduler": "ExponentialLR",
            "lr_scheduler_kwargs": {"gamma": 0.96},
            "weight_decay": 1e-6, "num_workers": 0, "validate_epoch": False,
        },
    }


def _folds(k):
    train = synthetic_ich_slices(n_slices=24, size=32, n_volumes=3, seed=k)
    test = synthetic_ich_slices(n_slices=16, size=32, n_volumes=2, seed=100 + k)
    return train, test


def test_kfold_experiment_artifacts(tmp_path):
    cfg = _cfg(tmp_path)
    out = run_supervised_2d(cfg, datasets_by_fold=_folds)

    for k in (1, 2):
        fold = os.path.join(out, f"Fold_{k}")
        assert os.path.exists(os.path.join(fold, "outputs.json"))
        assert os.path.exists(os.path.join(fold, "trained_unet.bin"))
        assert os.path.exists(os.path.join(fold, "log.txt"))
        assert os.path.exists(os.path.join(fold, "pred/slice_prediction_scores.csv"))
        assert os.path.exists(os.path.join(fold, "pred/volume_prediction_scores.csv"))
        assert not os.path.exists(os.path.join(fold, "checkpoint.bin"))  # deleted
        with open(os.path.join(fold, "outputs.json")) as f:
            o = json.load(f)
        assert o["eval"]["dice"]["all"] is not None
        assert len(o["train"]["evolution"]) == 2
        log = open(os.path.join(fold, "log.txt")).read()
        assert "Cross-Validation fold" in log and "Epoch: 001/002" in log

    # aggregates
    avg = open(os.path.join(out, "average_scores.txt")).read()
    assert "Dice =" in avg and "+/-" in avg
    assert os.path.exists(os.path.join(out, "all_volume_prediction.csv"))
    assert os.path.exists(os.path.join(out, "config.json"))


def test_kfold_fold_idempotency(tmp_path):
    """Folds with existing outputs.json are skipped on re-run (reference
    UNet2D_scripts.py:75)."""
    cfg = _cfg(tmp_path)
    out = run_supervised_2d(cfg, datasets_by_fold=_folds)
    mtime = os.path.getmtime(os.path.join(out, "Fold_1/outputs.json"))
    run_supervised_2d(cfg, datasets_by_fold=_folds)  # should skip training
    assert os.path.getmtime(os.path.join(out, "Fold_1/outputs.json")) == mtime


def test_build_unet_from_cfg_passes_gated():
    """attention_unet2d.py sets net.gated=True; dropping it would silently
    train a plain U-Net on the gated-conv workload."""
    from ich_tpu.experiments.supervised2d import build_unet_from_cfg

    assert build_unet_from_cfg({"gated": True, "depth": 3}).gated is True
    assert build_unet_from_cfg({"depth": 3}).gated is False


def test_transfer_weights_raises_on_zero_intersection():
    """A transfer that moves nothing is always a config bug (e.g. pretrain
    encoder and fine-tune net built with different top_filter) — it must
    fail loudly, not silently fine-tune from random init."""
    import jax.numpy as jnp
    import pytest

    from ich_tpu.train.checkpoint import transfer_weights

    tgt = {"params": {"a": jnp.zeros((2, 2))}}
    src = {"params": {"b": jnp.ones((2, 2))}}
    with pytest.raises(ValueError, match="none of the"):
        transfer_weights(tgt, src)
    # shape mismatch on every shared path is the same failure
    src2 = {"params": {"a": jnp.ones((3, 3))}}
    with pytest.raises(ValueError, match="none of the"):
        transfer_weights(tgt, src2)
