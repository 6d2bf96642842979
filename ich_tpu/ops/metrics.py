"""Segmentation / classification metrics as device ops.

Reproduces the reference's metric definitions exactly (see BASELINE.md):

- per-sample binary confusion matrix (reference
  ``code/src/utils/tensor_utils.py:12-36``),
- slice Dice ``(2TP+1)/(2TP+FP+FN+1)`` (reference
  ``code/src/models/optim/UNet2D.py:250``),
- volumetric Dice: confusion matrices summed per patient then the same
  formula (``UNet2D.py:255-256``) — implemented with ``segment_sum`` so the
  whole slice→volume groupby runs on device,
- volumetric IoU ``(TP+eps)/(TP+FP+FN+eps)`` (``UNet3D_trainer.py:249,256``),
- classifier metrics (ROC-AUC/accuracy/recall/precision/F1, reference
  ``Classifier.py:260-264,573-578``) — host-side via sklearn, eval-only.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def batch_binary_confusion_matrix(
    pred: jax.Array, target: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-batch-element TN, FP, FN, TP (same return order as the
    reference's ``batch_binary_confusion_matrix``).

    Inputs are binary arrays of shape (B, ...); reductions run over all
    non-batch axes. Counts are float32 (exact for counts < 2^24; a 512^2
    slice is ~2.6e5, a full 512^2x256 volume ~6.7e7, so volume-level sums
    are accumulated after this per-slice reduction, staying exact).
    """
    if pred.shape != target.shape:
        raise ValueError(f"Shapes do not match! {pred.shape} != {target.shape}")
    if pred.ndim < 2:
        raise ValueError(f"Need a batch dimension; got ndim={pred.ndim}")
    p = pred.reshape(pred.shape[0], -1).astype(jnp.float32)
    t = target.reshape(target.shape[0], -1).astype(jnp.float32)
    tp = jnp.sum(p * t, axis=1)
    tn = jnp.sum((1.0 - p) * (1.0 - t), axis=1)
    fp = jnp.sum(p * (1.0 - t), axis=1)
    fn = jnp.sum((1.0 - p) * t, axis=1)
    return tn, fp, fn, tp


def dice_from_counts(
    tp: jax.Array, fp: jax.Array, fn: jax.Array, smooth: float = 1.0
) -> jax.Array:
    """Smoothed Dice ``(2TP+s)/(2TP+FP+FN+s)`` (reference ``UNet2D.py:250``)."""
    return (2.0 * tp + smooth) / (2.0 * tp + fp + fn + smooth)


def iou_from_counts(
    tp: jax.Array, fp: jax.Array, fn: jax.Array, eps: float = 1.0
) -> jax.Array:
    """Smoothed IoU ``(TP+eps)/(TP+FP+FN+eps)`` (reference
    ``UNet3D_trainer.py:249,256``)."""
    return (tp + eps) / (tp + fp + fn + eps)


def volume_counts(
    tp: jax.Array,
    fp: jax.Array,
    fn: jax.Array,
    volume_ids: jax.Array,
    num_volumes: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sum per-slice confusion counts into per-volume counts on device.

    ``volume_ids`` maps each slice to a dense volume index in
    ``[0, num_volumes)``. This is the reference's pandas
    ``groupby('volID').sum()`` (``UNet2D.py:255``) as a ``segment_sum``.
    """
    vids = volume_ids.astype(jnp.int32)
    seg = lambda x: jax.ops.segment_sum(x, vids, num_segments=num_volumes)
    return seg(tp), seg(fp), seg(fn)


def volume_dice(
    tp: jax.Array,
    fp: jax.Array,
    fn: jax.Array,
    volume_ids: jax.Array,
    num_volumes: int,
    smooth: float = 1.0,
) -> jax.Array:
    """Per-volume Dice from per-slice counts (``UNet2D.py:255-256``)."""
    vtp, vfp, vfn = volume_counts(tp, fp, fn, volume_ids, num_volumes)
    return dice_from_counts(vtp, vfp, vfn, smooth)


def dice_all_and_positive(
    vol_dice: jax.Array, vol_has_ich: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Mean volumetric Dice over (all volumes, ICH-positive volumes) —
    reference ``UNet2D.py:261-264``. ``vol_has_ich`` is a boolean mask of
    volumes with at least one positive target voxel."""
    d_all = jnp.mean(vol_dice)
    pos = vol_has_ich.astype(jnp.float32)
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    d_pos = jnp.sum(vol_dice * pos) / n_pos
    return d_all, d_pos


def fold_aggregate(values: np.ndarray) -> Tuple[float, float]:
    """Mean ± 1.96σ across folds (reference
    ``scripts/unet-2D/UNet2D_scripts.py:203-207``)."""
    v = np.asarray(values, dtype=np.float64)
    return float(v.mean()), float(1.96 * v.std())


def classification_metrics(
    y_true: np.ndarray, y_score: np.ndarray, threshold: float = 0.5
) -> Dict[str, float]:
    """Binary classifier metrics (host-side, eval-only): AUC, accuracy,
    recall, precision, F1 — reference ``Classifier.py:260-264``."""
    from sklearn import metrics as skm

    y_true = np.asarray(y_true).ravel()
    y_score = np.asarray(y_score).ravel()
    y_pred = (y_score >= threshold).astype(np.int64)
    out = {
        "accuracy": float(skm.accuracy_score(y_true, y_pred)),
        "recall": float(skm.recall_score(y_true, y_pred, zero_division=0)),
        "precision": float(skm.precision_score(y_true, y_pred, zero_division=0)),
        "f1": float(skm.f1_score(y_true, y_pred, zero_division=0)),
    }
    try:
        out["auc"] = float(skm.roc_auc_score(y_true, y_score))
    except ValueError:  # single-class y_true
        out["auc"] = float("nan")
    return out


def multilabel_metrics(
    y_true: np.ndarray, y_score: np.ndarray, threshold: float = 0.5
) -> Dict[str, float]:
    """Multilabel classifier metrics with macro averaging + subset accuracy
    (reference ``Classifier.py:573-578``)."""
    from sklearn import metrics as skm

    y_true = np.asarray(y_true)
    y_pred = (np.asarray(y_score) >= threshold).astype(np.int64)
    out = {
        "subset_accuracy": float(skm.accuracy_score(y_true, y_pred)),
        "recall_macro": float(
            skm.recall_score(y_true, y_pred, average="macro", zero_division=0)
        ),
        "precision_macro": float(
            skm.precision_score(y_true, y_pred, average="macro", zero_division=0)
        ),
        "f1_macro": float(
            skm.f1_score(y_true, y_pred, average="macro", zero_division=0)
        ),
    }
    try:
        out["auc_macro"] = float(
            skm.roc_auc_score(y_true, np.asarray(y_score), average="macro")
        )
    except ValueError:
        out["auc_macro"] = float("nan")
    return out


def pixel_auc(heatmap: np.ndarray, mask: np.ndarray) -> float:
    """Pixel-level AUC of an anomaly heatmap against a binary mask
    (reference ``FCDD_eval_volumes.py:172``, ``AD_AE_scripts.py:127``)."""
    from sklearn import metrics as skm

    y = np.asarray(mask).ravel().astype(np.int64)
    s = np.asarray(heatmap).ravel()
    if y.max() == y.min():
        return float("nan")
    return float(skm.roc_auc_score(y, s))
