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


def _exp_window(exp_folder: str, default=(50.0, 200.0)):
    """HU window (center, width) from the experiment's re-dumped config.json
    (the reference reads cfg['data']['win_center'/'win_width'],
    ``analyse_exp.py:152``)."""
    fn = os.path.join(exp_folder, "config.json")
    try:
        with open(fn) as f:
            cfg = json.load(f)
        return float(cfg["data"]["win_center"]), float(cfg["data"]["win_width"])
    except Exception:
        return default


def _find_slice_files(data_path: str, vol_id: int, slice_nbr: int):
    """Locate the raw CT slice + ground-truth mask for (volume, slice).

    Tries the dataset's own ``ct_info.csv`` index first (the canonical
    layout produced by ``generate_2DSegDataset``), then the reference's
    hard-coded PhysioNet path patterns (``analyse_exp.py:141-165``).
    Returns (ct_path | None, mask_path | None)."""
    csv_fn = os.path.join(data_path, "ct_info.csv")
    if os.path.exists(csv_fn):
        import pandas as pd

        df = pd.read_csv(csv_fn, index_col=0)
        rows = df[(df.PatientNumber == vol_id) & (df.SliceNumber == slice_nbr)]
        if len(rows):
            r = rows.iloc[0]
            ct = os.path.join(data_path, str(r["CT_fn"]))
            m = r.get("mask_fn", None)
            mask = (
                os.path.join(data_path, str(m))
                if isinstance(m, str) and m not in ("", "-", "nan", "None")
                else None
            )
            return (
                ct if os.path.exists(ct) else None,
                mask if mask is not None and os.path.exists(mask) else None,
            )
    for ct_pat, m_pat in (
        (f"Patient_CT/{vol_id:03d}/{slice_nbr}.tif",
         f"Patient_CT/{vol_id:03d}/{slice_nbr}_ICH_Seg.bmp"),
        (f"{vol_id:03d}/ct_scans/{slice_nbr}.tif",
         f"{vol_id:03d}/masks/{slice_nbr}_ICH.bmp"),
    ):
        ct = os.path.join(data_path, ct_pat)
        if os.path.exists(ct):
            m = os.path.join(data_path, m_pat)
            return ct, (m if os.path.exists(m) else None)
    return None, None


def _load_overlay_triplet(exp_folder, data_path, row, window):
    """(windowed CT [0,1], target bool, pred bool) for one slice_df row, with
    the prediction nearest-resized to the CT's native resolution (reference
    ``analyse_exp.py:168-171``); (None, None, None) if artifacts missing."""
    from PIL import Image

    pred_fn = os.path.join(exp_folder, f"Fold_{int(row.Fold)}/pred", str(row.pred_fn))
    if not os.path.exists(pred_fn):
        return None, None, None
    pred = np.asarray(Image.open(pred_fn)) > 0
    ct_fn, mask_fn = (None, None)
    if data_path is not None:
        ct_fn, mask_fn = _find_slice_files(data_path, int(row.volID), int(row["slice"]))
    if ct_fn is None:
        return None, None, pred
    ct = np.asarray(Image.open(ct_fn)).astype(np.float32)
    c, w = window
    ct = np.clip((ct - (c - w / 2.0)) / max(w, 1e-6), 0.0, 1.0)
    target = np.zeros(ct.shape, dtype=bool)
    if mask_fn is not None:
        target = np.asarray(Image.open(mask_fn)) > 0
    if pred.shape != ct.shape:
        import scipy.ndimage as ndi

        zoom = (ct.shape[0] / pred.shape[0], ct.shape[1] / pred.shape[1])
        pred = ndi.zoom(pred.astype(np.uint8), zoom, order=0) > 0
    return ct, target, pred


def _overlay_grid_page(exp_folder, data_path, slice_df, window, n_overlay):
    """Reference-style 4-row panel (highest/lowest Dice x ICH/non-ICH) of
    predictions (red) + targets (green) over the real windowed CT slice
    (reference ``analyse_exp.py:120-194``). Returns the figure, or None if
    no overlay could be rendered."""
    specs = [
        (False, 1, "Highest Dice (ICH)"),
        (True, 1, "Lowest Dice (ICH)"),
        (False, 0, "Highest Dice (non-ICH)"),
        (True, 0, "Lowest Dice (non-ICH)"),
    ]
    fig, axes = plt.subplots(
        4, n_overlay, figsize=(2.0 * n_overlay, 8.6), squeeze=False
    )
    shown = 0
    for r, (asc, lab, title) in enumerate(specs):
        samp = slice_df[slice_df.label == lab].sort_values(
            "Dice", ascending=asc
        ).iloc[:n_overlay]
        for ci in range(n_overlay):
            ax = axes[r][ci]
            ax.axis("off")
            if ci >= len(samp):
                continue
            row = samp.iloc[ci]
            ct, target, pred = _load_overlay_triplet(exp_folder, data_path, row, window)
            if ct is None:
                continue
            imshow_pred(
                ct, pred, target=target, ax=ax,
                pred_color="xkcd:vermillion", target_color="forestgreen",
            )
            ax.set_title(
                f"{int(row.volID):03d}/{int(row['slice']):02d}  Dice {row.Dice:.2f}",
                fontsize=7,
            )
            shown += 1
        axes[r][0].text(
            -0.15, 0.5, title, fontsize=9, fontweight="bold", rotation=90,
            ha="center", va="center", transform=axes[r][0].transAxes,
        )
    if shown == 0:
        plt.close(fig)
        return None
    import matplotlib.patches as mpatches

    handles = [
        mpatches.Patch(facecolor="forestgreen", alpha=0.6),
        mpatches.Patch(facecolor="xkcd:vermillion", alpha=0.6),
    ]
    fig.legend(handles, ["Ground Truth", "Prediction"], loc="lower center",
               ncol=2, frameon=False)
    return fig


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

    # 5. best / worst prediction overlays: prediction (red) + target (green)
    #    over the real windowed CT slice (reference analyse_exp.py:120-194)
    window = _exp_window(exp_folder)
    axes = [fig.add_subplot(gs[2, i]) for i in range(3)]
    shown = 0
    if slice_df is not None:
        ranked = slice_df.loc[slice_df.label == 1].sort_values("Dice")
        picks = list(ranked.index[:2]) + list(ranked.index[-1:])
        for ax_i, idx in zip(axes, picks):
            row = slice_df.loc[idx]
            ct, target, pred = _load_overlay_triplet(exp_folder, data_path, row, window)
            if pred is None:
                continue
            if ct is None:  # no raw data available: pred bitmap only
                ct, target = np.zeros(pred.shape, dtype=float), None
            imshow_pred(ct, pred, target=target, ax=ax_i,
                        pred_color="xkcd:vermillion", target_color="forestgreen")
            ax_i.set_title(
                f"vol {int(row.volID)} slice {int(row['slice'])} Dice {row.Dice:.2f}",
                fontsize=8,
            )
            shown += 1
    for ax_i in axes[shown:]:
        ax_i.axis("off")

    from matplotlib.backends.backend_pdf import PdfPages

    with PdfPages(save_fn) as pdf:
        pdf.savefig(fig, bbox_inches="tight")
        plt.close(fig)
        if slice_df is not None:
            grid = _overlay_grid_page(
                exp_folder, data_path, slice_df, window, n_overlay
            )
            if grid is not None:
                pdf.savefig(grid, bbox_inches="tight")
                plt.close(grid)
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
