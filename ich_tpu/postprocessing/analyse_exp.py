"""Experiment report PDFs.

Equivalents of the reference's analysis entry points
(``code/src/postprocessing/analyse_exp.py:26,196``):

- :func:`analyse_supervised_exp` — multi-panel PDF from a k-fold supervised
  run: fold loss/Dice evolution with CI bands, per-volume confusion-count
  barplots, slice-vs-volume Dice comparison, and best/worst prediction
  overlays (when prediction bitmaps were saved).
- :func:`analyse_representation_exp` — pretraining PDF: loss curve +
  bottleneck t-SNE colored by ICH (and subtypes when available).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from ich_tpu.postprocessing.plots import (
    curve_std,
    imshow_pred,
    metric_barplot,
    plot_tsne,
)


def _load_fold_histories(exp_folder: str):
    hist = []
    for fn in sorted(glob.glob(os.path.join(exp_folder, "Fold_*/outputs.json"))):
        with open(fn) as f:
            hist.append(np.asarray(json.load(f)["train"]["evolution"], dtype=float))
    return hist


def analyse_supervised_exp(
    exp_folder: str,
    data_path: Optional[str] = None,
    n_fold: int = 10,
    save_fn: str = "results_overview.pdf",
    n_overlay: int = 8,
) -> str:
    import pandas as pd

    hist = _load_fold_histories(exp_folder)
    results_df = pd.read_csv(os.path.join(exp_folder, "all_volume_prediction.csv"), index_col=0)
    slice_dfs = []
    for i in range(n_fold):
        fn = os.path.join(exp_folder, f"Fold_{i + 1}/pred/slice_prediction_scores.csv")
        if os.path.exists(fn):
            df = pd.read_csv(fn, index_col=0)
            df["Fold"] = i + 1
            slice_dfs.append(df)
    slice_df = pd.concat(slice_dfs, axis=0).reset_index(drop=True) if slice_dfs else None

    fig = plt.figure(figsize=(15, 12))
    gs = fig.add_gridspec(3, 3, hspace=0.35, wspace=0.3)

    # 1. training evolution: loss + valid dice curves over folds
    ax = fig.add_subplot(gs[0, :2])
    if hist:
        max_len = max(h.shape[0] for h in hist)
        def col(i):
            cols = []
            for h in hist:
                c = h[:, i].astype(float) if h.shape[1] > i else np.full(h.shape[0], np.nan)
                cols.append(np.pad(c, (0, max_len - len(c)), constant_values=np.nan))
            return np.stack(cols, axis=1)
        x = np.arange(1, max_len + 1)[:, None]
        series = [np.concatenate([x, col(1)], axis=1)]
        names = ["Train Loss"]
        if hist[0].shape[1] > 3 and not np.all(np.isnan(col(2))):
            series += [np.concatenate([x, col(2)], axis=1), np.concatenate([x, col(3)], axis=1)]
            names += ["Dice (all)", "Dice (ICH)"]
        curve_std(series, names, colors=["black", "tomato", "dodgerblue"][: len(series)], ax=ax)
    ax.set_xlabel("Epoch")
    ax.set_ylabel("Dice loss / Dice")
    ax.set_title("Training evolution", loc="left", fontweight="bold")

    # 2. confusion counts per volume
    ax = fig.add_subplot(gs[0, 2])
    cm_cols = ["TP", "TN", "FP", "FN"]
    data_cm = [
        results_df[cm_cols].values,
        results_df.loc[results_df.label == 1, cm_cols].values,
        results_df.loc[results_df.label == 0, cm_cols].values,
    ]
    metric_barplot(
        data_cm, ["All", "ICH", "non-ICH"], cm_cols,
        colors=["tomato", "dodgerblue", "cornflowerblue"], ax=ax,
    )
    ax.set_yscale("symlog")
    ax.set_title("Volume confusion counts", loc="left", fontweight="bold")

    # 3. slice vs volume dice
    ax = fig.add_subplot(gs[1, 0])
    groups = [results_df[["Dice"]].values]
    names = ["Volume Dice"]
    if slice_df is not None:
        groups.append(slice_df[["Dice"]].values)
        names.append("Slice Dice")
    metric_barplot(groups, names, ["Dice"], colors=["tomato", "dodgerblue"], ax=ax)
    ax.set_ylim(0, 1.05)
    ax.set_title("Dice (volume vs slice)", loc="left", fontweight="bold")

    # 4. per-fold volume dice distribution
    ax = fig.add_subplot(gs[1, 1:])
    if "Dice" in results_df:
        ax.hist(results_df.Dice.values, bins=20, color="dodgerblue", alpha=0.7)
    ax.set_xlabel("Volume Dice")
    ax.set_title("Volume Dice distribution", loc="left", fontweight="bold")

    # 5. best / worst prediction overlays (if bmp artifacts + data exist)
    axes = [fig.add_subplot(gs[2, i]) for i in range(3)]
    shown = 0
    if slice_df is not None and data_path is not None:
        from PIL import Image

        ranked = slice_df.loc[slice_df.label == 1].sort_values("Dice")
        picks = list(ranked.index[:2]) + list(ranked.index[-1:])
        for ax_i, idx in zip(axes, picks):
            row = slice_df.loc[idx]
            pred_fn = os.path.join(
                exp_folder, f"Fold_{int(row.Fold)}/pred", str(row.pred_fn)
            )
            if os.path.exists(pred_fn):
                pred = np.asarray(Image.open(pred_fn)) > 0
                imshow_pred(np.zeros_like(pred, dtype=float), pred, ax=ax_i)
                ax_i.set_title(f"vol {int(row.volID)} slice {int(row['slice'])} Dice {row.Dice:.2f}", fontsize=8)
                shown += 1
    for ax_i in axes[shown:]:
        ax_i.axis("off")

    fig.savefig(save_fn, bbox_inches="tight")
    plt.close(fig)
    return save_fn


def analyse_representation_exp(
    exp_folder: str,
    save_fn: str = "pretrain_overview.pdf",
    subtype_names=("ICH", "subtype1", "subtype2", "subtype3", "subtype4", "subtype5"),
) -> str:
    """Pretraining report: loss curve + t-SNE of the bottleneck
    representation colored by label columns stored in outputs['eval']['repr']
    (reference ``analyse_exp.py:196-251``)."""
    with open(os.path.join(exp_folder, "outputs.json")) as f:
        out = json.load(f)
    hist = np.asarray(out["train"]["evolution"], dtype=float)
    repr_payload = out["eval"].get("repr")

    fig = plt.figure(figsize=(12, 5))
    ax = fig.add_subplot(1, 2, 1)
    ax.plot(hist[:, 0], hist[:, 1], color="black")
    ax.set_xlabel("Epoch")
    ax.set_ylabel("Loss")
    ax.set_title("Pretraining loss", loc="left", fontweight="bold")

    ax = fig.add_subplot(1, 2, 2)
    if repr_payload is not None:
        payload = np.asarray(repr_payload, dtype=float)
        emb = payload[:, :2]
        labels = payload[:, 2] if payload.shape[1] > 2 else None
        plot_tsne(emb, labels, ax=ax, legend_names=None)
        ax.set_title("Bottleneck t-SNE", loc="left", fontweight="bold")
    else:
        ax.axis("off")

    fig.savefig(save_fn, bbox_inches="tight")
    plt.close(fig)
    return save_fn
