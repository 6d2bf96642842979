"""Post-hoc brain-mask filtering of saved predictions.

Equivalent of the reference's ``code/src/postprocessing/update_pred.py``
(``update_pred_folder:27``, ``update_Kfold_folder:113``,
``update_anomaly_pred_folder:187``): AND every saved slice prediction with
a brain mask, rewrite the prediction bitmaps, recompute the slice/volume
confusion CSVs and the outputs.json Dice summary.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional

import numpy as np

from ich_tpu.data.core import SliceDataset2D


def _dice(tp, fp, fn, smooth=1.0):
    return (2 * tp + smooth) / (2 * tp + fp + fn + smooth)


def slice_score_row(pred, target, vol_id, slice_nbr, **extra) -> dict:
    """One per-slice confusion/Dice row (the schema shared by the AD CLIs
    and the prediction-folder updaters; smoothed Dice per the reference's
    ``update_pred.py:101-103``)."""
    pred = np.asarray(pred, np.float32)
    target = np.asarray(target, np.float32)
    tp = float((pred * target).sum())
    fp = float((pred * (1 - target)).sum())
    fn = float(((1 - pred) * target).sum())
    row = {"volID": int(vol_id), "slice": int(slice_nbr),
           "label": int(target.max() > 0), "TP": tp, "FP": fp, "FN": fn,
           "Dice": _dice(tp, fp, fn)}
    row.update(extra)
    return row


def write_prediction_scores(rows: list, out_dir: str):
    """Write ``slice_prediction_scores.csv`` + the volume-aggregated
    ``volume_prediction_scores.csv``; returns (slice_df, volume_df).
    An empty ``rows`` (every slice skipped/filtered) writes header-only
    CSVs instead of crashing on the missing groupby column."""
    import pandas as pd

    cols = ["volID", "slice", "label", "TP", "FP", "FN", "Dice"]
    df = pd.DataFrame(rows, columns=cols if not rows else None)
    df.to_csv(os.path.join(out_dir, "slice_prediction_scores.csv"))
    v = df.groupby("volID").agg({"label": "max", "TP": "sum", "FP": "sum", "FN": "sum"})
    v["Dice"] = _dice(v.TP, v.FP, v.FN)
    v.to_csv(os.path.join(out_dir, "volume_prediction_scores.csv"))
    return df, v


def update_pred_folder(
    fold_dir: str,
    dataset: SliceDataset2D,
    brain_masks: np.ndarray,
    pred_subdir: str = "pred",
) -> dict:
    """Filter every ``{vol}/{slice}.bmp`` under ``fold_dir/pred`` by the
    corresponding brain mask, rewrite bitmaps + CSVs + outputs.json.

    ``brain_masks``: (N, H, W) binary array aligned with ``dataset`` rows.
    Returns the updated outputs dict.
    """
    import pandas as pd
    from PIL import Image

    pred_dir = os.path.join(fold_dir, pred_subdir)
    rows = {k: [] for k in ["volID", "slice", "label", "TP", "TN", "FP", "FN", "pred_fn", "Dice"]}
    for i in range(len(dataset)):
        vid, snb = int(dataset.vol_ids[i]), int(dataset.slice_nbrs[i])
        rel = f"{vid}/{snb}.bmp"
        fn = os.path.join(pred_dir, rel)
        if not os.path.exists(fn):
            continue
        pred = (np.asarray(Image.open(fn)) > 0).astype(np.float32)
        brain = (brain_masks[i] > 0).astype(np.float32)
        if brain.shape != pred.shape:
            raise ValueError(f"brain mask shape {brain.shape} != pred {pred.shape}")
        pred = pred * brain
        Image.fromarray((pred * 255).astype(np.uint8)).save(fn)
        target = (dataset.masks[i] > 0).astype(np.float32)
        tp = float((pred * target).sum())
        tn = float(((1 - pred) * (1 - target)).sum())
        fp = float((pred * (1 - target)).sum())
        fnn = float(((1 - pred) * target).sum())
        rows["volID"].append(vid)
        rows["slice"].append(snb)
        rows["label"].append(int(target.max() > 0))
        rows["TP"].append(tp)
        rows["TN"].append(tn)
        rows["FP"].append(fp)
        rows["FN"].append(fnn)
        rows["pred_fn"].append(rel)
        rows["Dice"].append(_dice(tp, fp, fnn))

    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(pred_dir, "slice_prediction_scores.csv"))
    df3d = (
        df[["volID", "label", "TP", "TN", "FP", "FN"]]
        .groupby("volID")
        .agg({"label": "max", "TP": "sum", "TN": "sum", "FP": "sum", "FN": "sum"})
    )
    df3d["Dice"] = _dice(df3d.TP, df3d.FP, df3d.FN)
    df3d.to_csv(os.path.join(pred_dir, "volume_prediction_scores.csv"))

    out_fn = os.path.join(fold_dir, "outputs.json")
    outputs = {}
    if os.path.exists(out_fn):
        with open(out_fn) as f:
            outputs = json.load(f)
    outputs.setdefault("eval", {})["dice"] = {
        "all": float(df3d.Dice.mean()),
        "positive": float(df3d.loc[df3d.label == 1, "Dice"].mean())
        if (df3d.label == 1).any()
        else float("nan"),
    }
    with open(out_fn, "w") as f:
        json.dump(outputs, f)
    return outputs


def update_kfold_folder(
    exp_dir: str,
    n_fold: int,
    dataset_for_fold: Callable[[int], SliceDataset2D],
    brain_masks_for_fold: Callable[[int], np.ndarray],
) -> None:
    """Apply :func:`update_pred_folder` to every fold, then refresh the
    aggregate ``average_scores.txt`` and ``all_volume_prediction.csv``
    (reference ``update_Kfold_folder:113``)."""
    import pandas as pd

    scores = []
    for k in range(n_fold):
        fold_dir = os.path.join(exp_dir, f"Fold_{k + 1}")
        out = update_pred_folder(fold_dir, dataset_for_fold(k), brain_masks_for_fold(k))
        scores.append([out["eval"]["dice"]["all"], out["eval"]["dice"]["positive"]])
    means = np.asarray(scores).mean(axis=0)
    ci = 1.96 * np.asarray(scores).std(axis=0)
    with open(os.path.join(exp_dir, "average_scores.txt"), "w") as f:
        f.write(f"Dice = {means[0]} +/- {ci[0]}\n")
        f.write(f"Dice (Positive) = {means[1]} +/- {ci[1]}\n")
    dfs = [
        pd.read_csv(os.path.join(exp_dir, f"Fold_{k + 1}/pred/volume_prediction_scores.csv"))
        for k in range(n_fold)
    ]
    pd.concat(dfs, axis=0).reset_index(drop=True).to_csv(
        os.path.join(exp_dir, "all_volume_prediction.csv")
    )


def update_anomaly_pred_folder(
    pred_dir: str,
    dataset: SliceDataset2D,
    brain_masks: np.ndarray,
    heatmap_loader: Optional[Callable[[int], np.ndarray]] = None,
) -> "object":
    """Anomaly-map variant (reference ``update_anomaly_pred_folder:187``):
    zero heatmaps outside the brain and recompute slice/volume Dice CSVs
    from thresholded maps. ``heatmap_loader(i)`` returns the float map for
    dataset row i; defaults to reading ``{vol}/{slice}.npy``."""
    rows = []
    for i in range(len(dataset)):
        vid, snb = int(dataset.vol_ids[i]), int(dataset.slice_nbrs[i])
        if heatmap_loader is not None:
            heat = heatmap_loader(i)
        else:
            fn = os.path.join(pred_dir, f"{vid}/{snb}.npy")
            if not os.path.exists(fn):
                continue
            heat = np.load(fn)
        heat = heat * (brain_masks[i] > 0)
        pred = (heat >= 0.5).astype(np.float32)
        target = (dataset.masks[i] > 0).astype(np.float32)
        rows.append(slice_score_row(pred, target, vid, snb))
    # the reference writes BOTH CSVs (update_pred.py:284-285): without the
    # volume one, a stale pre-mask volume_prediction_scores.csv would feed
    # the k-fold aggregation
    df, _ = write_prediction_scores(rows, pred_dir)
    return df
