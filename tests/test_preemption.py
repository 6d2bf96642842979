import pytest
import os

import numpy as np

from ich_tpu.data import synthetic_ich_slices
from ich_tpu.models import UNet
from ich_tpu.train.segmentation2d import UNet2D
from ich_tpu.utils import preemption

pytestmark = pytest.mark.slow  # end-to-end: excluded from the fast subset



def test_preemption_checkpoints_and_stops(tmp_path):
    data = synthetic_ich_slices(n_slices=16, size=32, n_volumes=2, seed=0)
    t = UNet2D(UNet(depth=3, top_filter=4, p_dropout=0.0), n_epoch=50,
               batch_size=8, lr=1e-3, checkpoint_freq=100)
    path = str(tmp_path / "ckpt.bin")
    preemption._requested.set()  # simulate SIGTERM delivered mid-epoch-1
    try:
        t.train(data, checkpoint_path=path)
    finally:
        preemption.reset()
    # stopped after the first epoch and wrote a checkpoint despite freq=100
    assert len(t.outputs["train"]["evolution"]) == 1
    assert os.path.exists(path)

    # resume continues from epoch 1
    t2 = UNet2D(UNet(depth=3, top_filter=4, p_dropout=0.0), n_epoch=3,
                batch_size=8, lr=1e-3, checkpoint_freq=100)
    t2.train(data, checkpoint_path=path)
    assert [h[0] for h in t2.outputs["train"]["evolution"]] == [1, 2, 3]


def test_preempted_kfold_leaves_fold_resumable(tmp_path):
    """A preempted fold must NOT evaluate the undertrained model or write
    outputs.json (which would mark the fold complete forever) — the driver
    exits, leaving the checkpoint for the restart to resume."""
    from ich_tpu.experiments import run_supervised_2d

    cfg = {
        "exp_name": "pre", "path": {"DATA": str(tmp_path / "d"),
                                    "OUTPUT": str(tmp_path / "o")},
        "seed": 0, "data": {"win_center": 50, "win_width": 200, "size": 32,
                             "augmentation": {"train": {}, "eval": {}}},
        "dataset": {"frac_negative": 2}, "split": {"n_fold": 2, "shuffle": True},
        "net": {"depth": 3, "top_filter": 4, "p_dropout": 0.0},
        "train": {"loss_fn": "BinaryDiceLoss",
                  "loss_fn_kwargs": {"reduction": "mean"},
                  "n_epoch": 3, "batch_size": 8, "lr": 1e-3,
                  "validate_epoch": False},
    }
    folds = lambda k: (synthetic_ich_slices(16, 32, 2, seed=k),
                       synthetic_ich_slices(8, 32, 1, seed=50 + k))
    preemption._requested.set()
    try:
        with pytest.raises(SystemExit):
            run_supervised_2d(cfg, datasets_by_fold=folds)
    finally:
        preemption.reset()
    fold1 = tmp_path / "o" / "pre" / "Fold_1"
    assert not (fold1 / "outputs.json").exists()   # fold NOT marked done
    assert (fold1 / "checkpoint.bin").exists()     # resumable

    # restart completes both folds from the checkpoint
    run_supervised_2d(cfg, datasets_by_fold=folds)
    assert (fold1 / "outputs.json").exists()
    assert (tmp_path / "o" / "pre" / "Fold_2" / "outputs.json").exists()
