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


# ---------------- reference head-to-head (torch-free: pure host code) ----------


def _import_reference_postproc():
    """Import the reference's update_pred with FUNCTIONAL stubs for its
    absent deps (skimage io/transform/img_as_*, imageio, nibabel): the
    head-to-head test runs the reference's own pipeline on disk."""
    import sys
    import types

    from PIL import Image

    from tests.conftest import REFERENCE_ROOT, reference_available

    if not reference_available():
        return None
    for name in ("skimage", "skimage.io", "skimage.transform", "skimage.filters",
                 "skimage.morphology", "skimage.exposure", "imageio", "nibabel"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sk = sys.modules["skimage"]
    sk.io = sys.modules["skimage.io"]
    sk.transform = sys.modules["skimage.transform"]
    sk.io.imread = lambda fn: np.asarray(Image.open(fn))
    sk.io.imsave = lambda fn, arr, check_contrast=False: Image.fromarray(arr).save(fn)

    def resize(arr, shape, order=0, preserve_range=False):
        arr = np.asarray(arr)
        if arr.shape == tuple(shape):
            return arr
        iy = (np.arange(shape[0]) * arr.shape[0] / shape[0]).astype(int)
        jx = (np.arange(shape[1]) * arr.shape[1] / shape[1]).astype(int)
        return arr[np.ix_(iy, jx)]

    sk.transform.resize = resize

    def img_as_bool(arr):
        arr = np.asarray(arr)
        if arr.dtype == bool:
            return arr
        mid = 127.5 if np.issubdtype(arr.dtype, np.integer) else 0.5
        return arr > mid

    sk.img_as_bool = img_as_bool
    sk.img_as_ubyte = lambda arr: (np.asarray(arr, bool).astype(np.uint8) * 255
                                   if np.asarray(arr).dtype == bool
                                   else np.asarray(arr, np.uint8))

    # functional nibabel.load backed by ich_tpu's own NIfTI reader — the
    # reference's brain_as_nifti=False branch is broken (UnboundLocalError
    # on brain_vol, update_pred.py:61), so the nifti path is the only one
    from ich_tpu.data import nifti as ich_nifti

    class _Nifti:
        def __init__(self, fn):
            self._data = np.asarray(ich_nifti.load(fn)[0])

        def get_fdata(self):
            return self._data.astype(np.float64)

    sys.modules["nibabel"].load = _Nifti
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import src.postprocessing.update_pred as ref_up

    return ref_up


def test_update_pred_folder_matches_reference(tmp_path):
    """Head-to-head on identical on-disk artifacts: the reference's
    update_pred_folder (``update_pred.py:27-112``) vs ich_tpu's on the same
    predictions/brain-masks/targets — per-slice confusion counts, volume
    Dice, rewritten bitmaps, and the updated outputs.json must all agree."""
    ref_up = _import_reference_postproc()
    if ref_up is None:
        pytest.skip("no reference checkout")
    import json

    import pandas as pd
    from PIL import Image

    from ich_tpu.data.core import SliceDataset2D

    rng = np.random.default_rng(3)
    size, n_vol, per_vol = 32, 2, 6
    d = synthetic_ich_slices(n_vol * per_vol, size, n_vol, seed=7)
    # 1-based per-volume slice numbering (the reference's folder layout)
    slice_nbrs = np.concatenate([np.arange(1, per_vol + 1)] * n_vol)
    vol_ids = np.asarray(d.vol_ids) + 1  # reference 0-pads ids from 1
    masks = (np.asarray(d.masks) > 0).astype(np.uint8)
    # imperfect predictions: target shifted 1px + salt noise
    preds = np.roll(masks, 1, axis=2)
    preds |= (rng.random(preds.shape) < 0.01)
    # circular brain mask, identical for every slice
    yy, xx = np.mgrid[:size, :size]
    brain = ((yy - size / 2) ** 2 + (xx - size / 2) ** 2 < (size * 0.45) ** 2)
    brains = np.broadcast_to(brain, masks.shape).astype(np.uint8)

    # ---- reference on-disk layout (brain masks as NIfTI: the reference's
    # bmp-folder branch is broken — UnboundLocalError, update_pred.py:61)
    from ich_tpu.data import nifti as ich_nifti

    data_path = tmp_path / "data"
    pred_dir = tmp_path / "ref" / "Fold_1" / "pred"
    new_dir = tmp_path / "ref" / "Fold_1_new" / "pred"
    brain_dir = tmp_path / "brain"
    data_path.mkdir()
    brain_dir.mkdir()
    rows = []
    for i in range(len(masks)):
        vid, snb = int(vol_ids[i]), int(slice_nbrs[i])
        (pred_dir / f"{vid}").mkdir(parents=True, exist_ok=True)
        Image.fromarray(preds[i] * 255).save(pred_dir / f"{vid}" / f"{snb}.bmp")
        # a mask file for EVERY slice (zeros when negative): the literal
        # "None" the reference writes is in pandas' default NaN list, so a
        # read-back ct_info.csv turns it into float NaN and the reference's
        # `target_fn != 'None'` branch crashes on join — avoid that path
        mask_fn = f"m_{vid}_{snb}.bmp"
        Image.fromarray(masks[i] * 255).save(data_path / mask_fn)
        rows.append(dict(PatientNumber=vid, SliceNumber=snb,
                         Hemorrhage=int(masks[i].any()), mask_fn=mask_fn))
    for vid in np.unique(vol_ids):
        sel = vol_ids == vid  # (H, W, D) stack, slice order = slice_nbrs
        order = np.argsort(slice_nbrs[sel])
        vol = np.stack([brains[i] for i in np.nonzero(sel)[0][order]], axis=-1)
        ich_nifti.save(str(brain_dir / f"{int(vid):03}.nii"), vol.astype(np.uint8))
    pd.DataFrame(rows).to_csv(data_path / "ct_info.csv")
    (tmp_path / "ref" / "outputs.json").write_text(json.dumps({"eval": {}}))

    ref_up.update_pred_folder(str(pred_dir), str(new_dir), str(brain_dir),
                              brain_as_nifti=True, data_path=str(data_path),
                              rot=False)
    ref_slice = pd.read_csv(new_dir / "slice_prediction_scores.csv", index_col=0)
    ref_vol = pd.read_csv(new_dir / "volume_prediction_scores.csv", index_col=0)
    ref_out = json.loads((tmp_path / "ref" / "Fold_1_new" / "outputs.json").read_text())

    # ---- ich_tpu layout (same artifacts, in-place update)
    fold = tmp_path / "ours" / "Fold_1"
    for i in range(len(masks)):
        vid, snb = int(vol_ids[i]), int(slice_nbrs[i])
        (fold / "pred" / f"{vid}").mkdir(parents=True, exist_ok=True)
        Image.fromarray(preds[i] * 255).save(fold / "pred" / f"{vid}" / f"{snb}.bmp")
    (fold / "outputs.json").write_text(json.dumps({"eval": {}}))
    ds = SliceDataset2D(images=d.images, masks=masks, vol_ids=vol_ids,
                        slice_nbrs=slice_nbrs)
    ours_out = update_pred_folder(str(fold), ds, brains)
    ours_slice = pd.read_csv(fold / "pred" / "slice_prediction_scores.csv", index_col=0)
    ours_vol = pd.read_csv(fold / "pred" / "volume_prediction_scores.csv", index_col=0)

    # per-slice confusion counts identical
    key = ["volID", "slice"]
    r = ref_slice.sort_values(key).reset_index(drop=True)
    o = ours_slice.sort_values(key).reset_index(drop=True)
    for col in ("label", "TP", "TN", "FP", "FN"):
        np.testing.assert_array_equal(r[col].to_numpy().astype(float),
                                      o[col].to_numpy().astype(float), err_msg=col)
    np.testing.assert_allclose(r["Dice"], o["Dice"], rtol=1e-12)
    # volume Dice identical
    np.testing.assert_allclose(
        ref_vol.sort_index()["Dice"], ours_vol.sort_index()["Dice"], rtol=1e-12)
    # updated outputs.json identical
    assert ref_out["eval"]["dice"]["all"] == pytest.approx(
        ours_out["eval"]["dice"]["all"], rel=1e-12)
    assert ref_out["eval"]["dice"]["positive"] == pytest.approx(
        ours_out["eval"]["dice"]["positive"], rel=1e-12)
    # rewritten bitmaps identical
    for i in range(len(masks)):
        vid, snb = int(vol_ids[i]), int(slice_nbrs[i])
        a = np.asarray(Image.open(new_dir / f"{vid}" / f"{snb}.bmp"))
        b = np.asarray(Image.open(fold / "pred" / f"{vid}" / f"{snb}.bmp"))
        np.testing.assert_array_equal(a > 0, b > 0)


def test_write_prediction_scores_empty_rows(tmp_path):
    """No scored slices (all filtered) writes header-only CSVs, no crash."""
    from ich_tpu.postprocessing.update_pred import write_prediction_scores

    df, v = write_prediction_scores([], str(tmp_path))
    assert len(df) == 0 and len(v) == 0
    assert (tmp_path / "slice_prediction_scores.csv").exists()
    assert (tmp_path / "volume_prediction_scores.csv").exists()


def test_update_anomaly_pred_folder(tmp_path):
    """Brain-mask zeroing + threshold + both CSVs (reference
    ``update_pred.py:187`` semantics), incl. missing-heatmap skip."""
    import pandas as pd

    from ich_tpu.data.core import SliceDataset2D
    from ich_tpu.postprocessing.update_pred import update_anomaly_pred_folder

    rng = np.random.default_rng(0)
    n, s = 4, 16
    images = rng.uniform(size=(n, s, s)).astype(np.float32)
    masks = np.zeros((n, s, s), np.float32)
    masks[0, 2:6, 2:6] = 1  # one positive slice
    ds = SliceDataset2D(images, masks, [1, 1, 2, 2], [0, 1, 0, 1])
    brain = np.zeros((n, s, s), np.float32)
    brain[:, 4:12, 4:12] = 1

    heat = rng.uniform(0.4, 1.0, size=(n, s, s)).astype(np.float32)
    for i in range(n - 1):  # last slice has NO saved heatmap -> skipped
        vid, snb = int(ds.vol_ids[i]), int(ds.slice_nbrs[i])
        os.makedirs(tmp_path / f"{vid}", exist_ok=True)
        np.save(tmp_path / f"{vid}" / f"{snb}.npy", heat[i])

    df = update_anomaly_pred_folder(str(tmp_path), ds, brain)
    assert len(df) == n - 1  # missing heatmap skipped
    sl = pd.read_csv(tmp_path / "slice_prediction_scores.csv", index_col=0)
    vl = pd.read_csv(tmp_path / "volume_prediction_scores.csv", index_col=0)
    assert list(sl.columns) == ["volID", "slice", "label", "TP", "FP", "FN", "Dice"]
    assert set(vl.index) == {1, 2}
    # hand-check row 0: pred = (heat * brain >= .5), smoothed Dice
    pred = ((heat[0] * brain[0]) >= 0.5).astype(np.float32)
    t = masks[0]
    tp = float((pred * t).sum()); fp = float((pred * (1 - t)).sum())
    fn = float(((1 - pred) * t).sum())
    row = sl.iloc[0]
    assert (row.TP, row.FP, row.FN) == (tp, fp, fn)
    assert abs(row.Dice - (2 * tp + 1) / (2 * tp + fp + fn + 1)) < 1e-9
    assert int(row.label) == 1
