import json
import os

import numpy as np
import pytest

from ich_tpu.data import synthetic_ich_slices
from ich_tpu.postprocessing import plots
from ich_tpu.postprocessing.analyse_exp import (
    analyse_representation_exp,
    analyse_supervised_exp,
)
from ich_tpu.postprocessing.update_pred import update_kfold_folder, update_pred_folder


@pytest.fixture(scope="module")
def exp_dir(tmp_path_factory):
    """Run a tiny 2-fold experiment once; reuse for all postprocessing tests."""
    from ich_tpu.experiments import run_supervised_2d

    tmp = tmp_path_factory.mktemp("exp")
    cfg = {
        "exp_name": "pp", "path": {"DATA": str(tmp / "d"), "OUTPUT": str(tmp / "o")},
        "seed": 0, "data": {"win_center": 50, "win_width": 200, "size": 32,
                             "augmentation": {"train": {}, "eval": {}}},
        "dataset": {"frac_negative": 2}, "split": {"n_fold": 2, "shuffle": True},
        "net": {"depth": 3, "top_filter": 4, "p_dropout": 0.0},
        "train": {"loss_fn": "BinaryDiceLoss",
                  "loss_fn_kwargs": {"reduction": "mean", "p": 2, "alpha": 0.2},
                  "n_epoch": 1, "batch_size": 8, "lr": 1e-3,
                  "validate_epoch": False},
    }
    folds = lambda k: (
        synthetic_ich_slices(24, 32, 3, seed=k),
        synthetic_ich_slices(16, 32, 2, seed=50 + k),
    )
    out = run_supervised_2d(cfg, datasets_by_fold=folds)
    return out


def test_analyse_supervised_exp_pdf(exp_dir, tmp_path):
    pdf = str(tmp_path / "overview.pdf")
    analyse_supervised_exp(exp_dir, data_path=None, n_fold=2, save_fn=pdf)
    assert os.path.getsize(pdf) > 5000


def test_analyse_supervised_exp_real_ct_overlays(exp_dir, tmp_path):
    """Overlay panels must show the REAL windowed CT + green target under the
    red prediction when data_path is provided (reference analyse_exp.py:120-194)."""
    import pandas as pd

    from ich_tpu.data import write_segich_tree
    from ich_tpu.postprocessing.analyse_exp import _load_overlay_triplet

    # the exp fixture's Fold_1 test set is synthetic_ich_slices(..., seed=50)
    ds = synthetic_ich_slices(16, 32, 2, seed=50)
    tree = write_segich_tree(ds, str(tmp_path / "data"))

    slice_df = pd.read_csv(
        os.path.join(exp_dir, "Fold_1/pred/slice_prediction_scores.csv"), index_col=0
    )
    slice_df["Fold"] = 1
    pos = slice_df[slice_df.label == 1]
    assert len(pos) > 0
    ct, target, pred = _load_overlay_triplet(exp_dir, tree, pos.iloc[0], (50, 200))
    assert ct is not None and float(np.std(ct)) > 0.02  # real CT, not zeros
    assert target is not None and target.any()
    assert pred is not None and pred.shape == ct.shape

    pdf = str(tmp_path / "overview_real.pdf")
    analyse_supervised_exp(exp_dir, data_path=tree, n_fold=2, save_fn=pdf)
    raw = open(pdf, "rb").read()
    # page 1 overview + page 2 four-row overlay grid
    assert raw.count(b"/Type /Page") >= 2


def test_segich_tree_roundtrip(tmp_path):
    """write_segich_tree (PhysioNet layout, mask_fn='None' negatives) must
    round-trip through load_segich_2d."""
    from ich_tpu.data import write_segich_tree
    from ich_tpu.data.segich import load_segich_2d

    ds = synthetic_ich_slices(12, 32, 2, seed=7)
    tree = write_segich_tree(ds, str(tmp_path / "physio"))
    out = load_segich_2d(tree, window=(50, 200), size=32)
    np.testing.assert_allclose(out.images, ds.images, atol=2e-3)
    np.testing.assert_allclose(out.masks, (ds.masks > 0).astype(np.float32))
    np.testing.assert_array_equal(out.vol_ids, ds.vol_ids)


def test_update_pred_folder(exp_dir):
    ds = synthetic_ich_slices(16, 32, 2, seed=50)
    # brain mask = everything -> scores unchanged; then empty -> TP=0
    fold = os.path.join(exp_dir, "Fold_1")
    with open(os.path.join(fold, "outputs.json")) as f:
        before = json.load(f)["eval"]["dice"]["all"]
    out = update_pred_folder(fold, ds, np.ones((16, 32, 32), np.float32))
    np.testing.assert_allclose(out["eval"]["dice"]["all"], before, atol=1e-6)
    out = update_pred_folder(fold, ds, np.zeros((16, 32, 32), np.float32))
    # all predictions zeroed: every negative slice scores Dice 1 (smoothing)
    import pandas as pd

    df = pd.read_csv(os.path.join(fold, "pred/slice_prediction_scores.csv"), index_col=0)
    assert (df.TP == 0).all() and (df.FP == 0).all()


def test_update_kfold_folder(exp_dir):
    ds = lambda k: synthetic_ich_slices(16, 32, 2, seed=50 + k)
    update_kfold_folder(exp_dir, 2, ds, lambda k: np.ones((16, 32, 32), np.float32))
    assert os.path.exists(os.path.join(exp_dir, "average_scores.txt"))


def test_analyse_representation_exp(tmp_path):
    out = {
        "train": {"evolution": [[1, 0.5], [2, 0.4]], "time": 1.0},
        "eval": {"repr": np.random.default_rng(0).normal(size=(50, 3)).tolist(), "time": 1.0},
    }
    d = tmp_path / "ssl"
    d.mkdir()
    with open(d / "outputs.json", "w") as f:
        json.dump(out, f)
    pdf = str(tmp_path / "ssl.pdf")
    analyse_representation_exp(str(d), save_fn=pdf)
    assert os.path.getsize(pdf) > 3000


def test_plot_helpers(tmp_path):
    rng = np.random.default_rng(0)
    fig_ax = __import__("matplotlib.pyplot", fromlist=["subplots"])
    import matplotlib.pyplot as plt

    # curve_std
    data = [np.concatenate([np.arange(10)[:, None], rng.normal(size=(10, 3))], axis=1)]
    fig, ax = plt.subplots()
    plots.curve_std(data, ["a"], ax=ax)
    plt.close(fig)
    # metric_barplot + significance
    fig, ax = plt.subplots()
    plots.metric_barplot([rng.normal(size=(20, 2)), rng.normal(1, 1, size=(20, 2))],
                         ["x", "y"], ["m1", "m2"], ax=ax)
    ps = plots.add_stat_significance([(0, 1)], [rng.normal(size=50), rng.normal(2, 1, 50)], ax=ax)
    assert ps[0] < 0.05
    plt.close(fig)
    # overlay + tsne + boxplot_hist
    fig, ax = plt.subplots()
    plots.imshow_pred(rng.uniform(size=(16, 16)), rng.uniform(size=(16, 16)) > 0.8,
                      rng.uniform(size=(16, 16)) > 0.8, ax=ax)
    plt.close(fig)
    fig, ax = plt.subplots()
    plots.plot_tsne(rng.normal(size=(30, 2)), labels=rng.integers(0, 2, 30), ax=ax)
    plt.close(fig)
    fig, ax = plt.subplots()
    plots.boxplot_hist([rng.normal(size=40), rng.normal(size=40)], ["a", "b"], ax=ax)
    plt.close(fig)
    # gif
    gif = str(tmp_path / "p.gif")
    plots.pred2gif([np.zeros((8, 8))] * 3, [np.ones((8, 8))] * 3, gif)
    assert os.path.getsize(gif) > 100
