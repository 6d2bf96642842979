"""Dataset loaders mirroring the reference's 8 dataset classes.

The reference's datasets (``code/src/dataset/datasets.py``) pair lazy
per-sample file reads with CPU augmentation. Here every loader decodes to
dense arrays once (host) and returns the containers in
:mod:`ich_tpu.data.core`; augmentation / corruption / view generation are
device-side concerns of the trainers (SURVEY §7 design stance). Mapping:

- ``public_SegICH_Dataset2D`` (``:26-94``)   → :func:`ich_tpu.data.segich.load_segich_2d`
- ``public_SegICH_AttentionDataset2D`` (``:96-172``) → :func:`load_segich_attention_2d`
- ``public_SegICH_Dataset3D`` (``:174-248``) → :func:`load_segich_3d` (the
  reference class crashes on an undefined variable, SURVEY §2.10 — fixed)
- ``brain_extract_Dataset2D`` (``:250-318``) → :func:`load_brain_extract_2d`
- ``RSNA_dataset`` 5 modes (``:320-422``)    → :func:`load_rsna_slices` +
  mode handling in the trainers (patch-swap / two views / labels on device)
- ``RSNA_Inpaint_dataset`` (``:424-540``)    → images via
  :func:`load_rsna_slices`; free-form masks on device
  (:func:`ich_tpu.ops.masks.random_ff_masks`)
- ``ImgMaskDataset`` (``:542-601``)          → :func:`load_img_mask_pairs`
- ``RSNA_FCDD_dataset`` (``:603-719``)       → images+labels via
  :func:`load_rsna_slices`; ellipse anomalies on device
  (:func:`ich_tpu.ops.masks.draw_ellipses`)
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

from ich_tpu.data.core import LabeledSliceDataset, SliceDataset2D, VolumeDataset3D
from ich_tpu.data.segich import _read_image, _resize_host
from ich_tpu.ops.ct import window_ct


def load_segich_attention_2d(
    data_dir: str,
    info_df=None,
    window: Tuple[float, float] = (50, 200),
    size: int = 256,
    attention_col: str = "attention_fn",
) -> SliceDataset2D:
    """2D slices with an anomaly-attention map stacked as channel 2
    (reference ``public_SegICH_AttentionDataset2D``, ``datasets.py:96-172``):
    images come out (N, H, W, 2)."""
    import pandas as pd

    if info_df is None:
        info_df = pd.read_csv(os.path.join(data_dir, "info.csv"), index_col=0)
    n = len(info_df)
    images = np.zeros((n, size, size, 2), dtype=np.float32)
    masks = np.zeros((n, size, size), dtype=np.float32)
    vol_ids = np.zeros(n, dtype=np.int32)
    slice_nbrs = np.zeros(n, dtype=np.int32)
    for i, (_, row) in enumerate(info_df.iterrows()):
        img = _read_image(os.path.join(data_dir, str(row["CT_fn"]))).astype(np.float32)
        img = np.asarray(window_ct(img, window[0], window[1]))
        images[i, :, :, 0] = _resize_host(img, size, order=1)
        att_fn = row.get(attention_col, None)
        if isinstance(att_fn, str) and att_fn not in ("", "-", "None", "nan"):
            att = _read_image(os.path.join(data_dir, att_fn)).astype(np.float32)
            att = att / max(att.max(), 1e-8)
            images[i, :, :, 1] = _resize_host(att, size, order=1)
        mask_fn = row.get("mask_fn", None)
        if isinstance(mask_fn, str) and mask_fn not in ("", "-", "None", "nan"):
            m = _read_image(os.path.join(data_dir, mask_fn)).astype(np.float32)
            masks[i] = _resize_host((m > 0).astype(np.float32), size, order=0)
        vol_ids[i] = int(row["PatientNumber"])
        slice_nbrs[i] = int(row["SliceNumber"])
    return SliceDataset2D(images, masks, vol_ids, slice_nbrs)


def load_segich_3d(
    data_dir: str,
    patient_numbers: Sequence[int],
    window: Tuple[float, float] = (50, 200),
    out_spacing: Tuple[float, float, float] = (-1.0, -1.0, 2.5),
) -> VolumeDataset3D:
    """NIfTI volumes + masks, rot90, windowed, resampled to ``out_spacing``
    (order 1 image / order 0 mask) — the intent of the reference's broken
    ``public_SegICH_Dataset3D`` (``datasets.py:174-248``)."""
    import jax.numpy as jnp

    from ich_tpu.data import nifti
    from ich_tpu.ops.ct import resample_ct, _resampled_shape, resize_nearest_zoom

    vols, masks, ids = [], [], []
    for pid in patient_numbers:
        vol, affine, hdr = nifti.load(os.path.join(data_dir, "ct_scans", f"{pid:03}.nii"))
        msk, _, _ = nifti.load(os.path.join(data_dir, "masks", f"{pid:03}.nii"))
        vol = np.rot90(vol, axes=(0, 1))
        msk = np.rot90(msk, axes=(0, 1))
        vol = np.asarray(window_ct(vol.astype(np.float32), window[0], window[1]))
        spacing = nifti.pixdim(hdr)
        vol = np.asarray(
            resample_ct(jnp.asarray(vol), spacing, out_spacing, preserve_range=True, order=1)
        )
        shape = _resampled_shape(msk.shape, spacing, out_spacing)
        # scipy-zoom grid convention, matching the reference's
        # resample_ct(mask, ..., order=0) (datasets.py:243, ct_utils.py:63)
        msk = np.asarray(resize_nearest_zoom(jnp.asarray((msk > 0).astype(np.float32)), shape))
        # (H, W, Z) -> (Z, H, W) for the 3D trainers
        vols.append(np.transpose(vol, (2, 0, 1)))
        masks.append(np.transpose(msk, (2, 0, 1)))
        ids.append(pid)
    return VolumeDataset3D(vols, masks, np.asarray(ids))


def load_brain_extract_2d(
    data_dir: str,
    info_df=None,
    window: Tuple[float, float] = (50, 200),
    size: int = 256,
) -> SliceDataset2D:
    """Brain-mask variant of the 2D loader (reference
    ``brain_extract_Dataset2D``, ``datasets.py:250-318``): same schema, the
    mask column holds brain masks instead of ICH masks."""
    from ich_tpu.data.segich import load_segich_2d

    return load_segich_2d(data_dir, info_df, window=window, size=size)


def load_rsna_slices(
    data_dir: str,
    slice_df=None,
    window: Tuple[float, float] = (50, 200),
    size: int = 256,
    n_max: Optional[int] = None,
    label_columns: Sequence[str] = (
        "Hemorrhage", "epidural", "intraparenchymal", "intraventricular",
        "subarachnoid", "subdural", "no_Hemorrhage",
    ),
) -> LabeledSliceDataset:
    """RSNA DICOM slices + 7-way multilabel vector (reference
    ``RSNA_dataset``, ``datasets.py:320-422``; csv schema from
    ``generate_RSNA_csv.py``). The 5 reference modes map to trainers:
    standard/classification use (images, labels); context_restoration and
    contrastive corruptions/views are generated on device."""
    import pandas as pd

    from ich_tpu.data.dicom import read_ct_hu

    if slice_df is None:
        slice_df = pd.read_csv(os.path.join(data_dir, "slice_info.csv"), index_col=0)
    if n_max is not None:
        slice_df = slice_df.iloc[:n_max]
    n = len(slice_df)
    images = np.zeros((n, size, size), dtype=np.float32)
    labels = np.zeros((n, len(label_columns)), dtype=np.float32)
    for i, (_, row) in enumerate(slice_df.iterrows()):
        hu = read_ct_hu(os.path.join(data_dir, str(row["filename"])))
        img = np.asarray(window_ct(hu, window[0], window[1]))
        images[i] = _resize_host(img, size, order=1)
        for j, col in enumerate(label_columns):
            if col in row:
                labels[i, j] = float(row[col])
    return LabeledSliceDataset(images, labels)


def load_img_mask_pairs(
    pairs: Sequence[Tuple[str, str]], size: Optional[int] = None
) -> SliceDataset2D:
    """Generic (image_fn, mask_fn) loader for GAN validation (reference
    ``ImgMaskDataset``, ``datasets.py:542-601``)."""
    images, masks = [], []
    for im_fn, mask_fn in pairs:
        img = _read_image(im_fn).astype(np.float32)
        if img.max() > 1:
            img = img / 255.0
        m = (_read_image(mask_fn) > 0).astype(np.float32)
        if size is not None:
            img = _resize_host(img, size, order=1)
            m = _resize_host(m, size, order=0)
        images.append(img)
        masks.append(m)
    n = len(images)
    return SliceDataset2D(
        np.stack(images), np.stack(masks), np.arange(n), np.zeros(n, np.int32)
    )
