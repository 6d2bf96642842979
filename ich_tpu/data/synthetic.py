"""Synthetic head-CT-like data for tests and benchmarks.

Generates volumes with a skull-like bright ring, brain-tissue texture, and
ellipsoidal hyperdense "hemorrhage" lesions with matching masks — enough
structure for end-to-end smoke training to reach a meaningful Dice, without
any external dataset (the reference's data — PhysioNet/RSNA/CQ500 — is not
redistributable; SURVEY §2.9).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ich_tpu.data.core import SliceDataset2D


def _lesion_mask_2d(
    rng: np.random.Generator, h: int, w: int, max_lesions: int = 2
) -> np.ndarray:
    mask = np.zeros((h, w), dtype=np.float32)
    n = rng.integers(0, max_lesions + 1)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(n):
        cy, cx = rng.uniform(0.25 * h, 0.75 * h), rng.uniform(0.25 * w, 0.75 * w)
        ry, rx = rng.uniform(0.03, 0.12) * h, rng.uniform(0.03, 0.12) * w
        theta = rng.uniform(0, np.pi)
        ys, xs = yy - cy, xx - cx
        yr = ys * np.cos(theta) + xs * np.sin(theta)
        xr = -ys * np.sin(theta) + xs * np.cos(theta)
        mask[(yr / ry) ** 2 + (xr / rx) ** 2 <= 1.0] = 1.0
    return mask


def synthetic_ich_slices(
    n_slices: int = 64,
    size: int = 64,
    n_volumes: int = 8,
    seed: int = 0,
    positive_frac: float = 0.6,
) -> SliceDataset2D:
    """Windowed-intensity [0,1] slices with lesions; returns SliceDataset2D."""
    rng = np.random.default_rng(seed)
    h = w = size
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.sqrt((yy - h / 2) ** 2 + (xx - w / 2) ** 2)
    brain = (r < 0.42 * h).astype(np.float32)
    skull = ((r >= 0.42 * h) & (r < 0.48 * h)).astype(np.float32)

    images = np.empty((n_slices, h, w), dtype=np.float32)
    masks = np.empty((n_slices, h, w), dtype=np.float32)
    vol_ids = np.repeat(np.arange(n_volumes), int(np.ceil(n_slices / n_volumes)))[:n_slices]
    slice_nbrs = np.concatenate(
        [np.arange((vol_ids == v).sum()) for v in range(n_volumes)]
    )[:n_slices]
    for i in range(n_slices):
        tissue = 0.35 + 0.08 * rng.standard_normal((h, w)).astype(np.float32)
        if rng.uniform() < positive_frac:
            lesion = _lesion_mask_2d(rng, h, w) * brain
        else:
            lesion = np.zeros((h, w), dtype=np.float32)
        img = tissue * brain + 1.0 * skull
        img = np.where(lesion > 0, 0.75 + 0.05 * rng.standard_normal((h, w)), img)
        images[i] = np.clip(img, 0.0, 1.0)
        masks[i] = lesion
    return SliceDataset2D(images, masks, vol_ids, slice_nbrs)


def synthetic_rsna_slices(
    n_slices: int = 128, size: int = 64, seed: int = 0, positive_frac: float = 0.4
):
    """Slices with binary ICH labels + 7-way multilabel vectors (column 0 =
    'any', like the RSNA stage-2 schema the reference pivots in
    ``generate_RSNA_csv.py``). Returns a LabeledSliceDataset whose labels
    are (N, 7); use ``labels[:, 0]`` as the binary target."""
    from ich_tpu.data.core import LabeledSliceDataset

    ds = synthetic_ich_slices(
        n_slices=n_slices, size=size, n_volumes=max(1, n_slices // 8),
        seed=seed, positive_frac=positive_frac,
    )
    rng = np.random.default_rng(seed + 1)
    has_ich = (ds.masks.reshape(n_slices, -1).max(axis=1) > 0).astype(np.float32)
    subtype = rng.integers(0, 5, size=n_slices)
    labels = np.zeros((n_slices, 7), dtype=np.float32)
    labels[:, 0] = has_ich
    for i in range(n_slices):
        if has_ich[i]:
            labels[i, 1 + subtype[i]] = 1.0
    return LabeledSliceDataset(ds.images, labels)


def write_segich_tree(
    dataset,
    out_dir: str,
    window: Tuple[float, float] = (50.0, 200.0),
) -> str:
    """Write a SliceDataset2D to disk in the PhysioNet publicSegICH-2D layout
    produced by the reference's generator
    (``scripts/data_preparation/generate_2DSegDataset.py:32-95``):

    - ``Patient_CT/{id:03d}/{slice}.tif`` CT slices (float32, HU units —
      the [0,1] dataset intensities are un-windowed back to HU),
    - ``Patient_CT/{id:03d}/{slice}_ICH_Seg.bmp`` masks for POSITIVE slices
      only; ``mask_fn='None'`` rows otherwise (the reference's convention),
    - ``ct_info.csv`` (PatientNumber, SliceNumber, CT_fn, mask_fn,
      Hemorrhage) and ``patient_info.csv``.

    Used as the spec-faithful on-disk fixture for loader tests and as the
    data source for prediction-overlay reports."""
    import os

    import pandas as pd
    from PIL import Image

    c, w = window
    os.makedirs(os.path.join(out_dir, "Patient_CT"), exist_ok=True)
    rows, patients = [], {}
    for i in range(len(dataset)):
        vid = int(dataset.vol_ids[i])
        snb = int(dataset.slice_nbrs[i])
        pdir = os.path.join(out_dir, "Patient_CT", f"{vid:03d}")
        os.makedirs(pdir, exist_ok=True)
        hu = dataset.images[i] * w + (c - w / 2.0)
        ct_fn = f"Patient_CT/{vid:03d}/{snb}.tif"
        Image.fromarray(hu.astype(np.float32), mode="F").save(os.path.join(out_dir, ct_fn))
        pos = int(dataset.masks[i].max() > 0)
        mask_fn = "None"
        if pos:
            mask_fn = f"Patient_CT/{vid:03d}/{snb}_ICH_Seg.bmp"
            Image.fromarray(((dataset.masks[i] > 0) * 255).astype(np.uint8)).save(
                os.path.join(out_dir, mask_fn)
            )
        rows.append({"PatientNumber": vid, "SliceNumber": snb,
                     "CT_fn": ct_fn, "mask_fn": mask_fn, "Hemorrhage": pos})
        patients[vid] = max(patients.get(vid, 0), pos)
    pd.DataFrame(rows).to_csv(os.path.join(out_dir, "ct_info.csv"))
    pd.DataFrame(
        [{"PatientNumber": k, "Hemorrhage": v} for k, v in sorted(patients.items())]
    ).to_csv(os.path.join(out_dir, "patient_info.csv"))
    return out_dir


def synthetic_ich_volume(
    size: int = 64, depth: int = 32, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """One (H, W, D) volume in raw HU-like units + its (H, W, D) mask."""
    rng = np.random.default_rng(seed)
    ds = synthetic_ich_slices(n_slices=depth, size=size, n_volumes=1, seed=seed)
    vol = np.transpose(ds.images, (1, 2, 0))  # (H, W, D)
    mask = np.transpose(ds.masks, (1, 2, 0))
    # map [0,1] windowed intensity back to a HU-like range (win 50/200)
    vol_hu = vol * 200.0 + (50.0 - 100.0)
    return vol_hu.astype(np.float32), mask.astype(np.float32)
