"""Synthetic head-CT-like data for tests and benchmarks.

Generates volumes with a skull-like bright ring, brain-tissue texture, and
ellipsoidal hyperdense "hemorrhage" lesions with matching masks — enough
structure for end-to-end smoke training to reach a meaningful Dice, without
any external dataset (the reference's data — PhysioNet/RSNA/CQ500 — is not
redistributable; SURVEY §2.9).
"""

from __future__ import annotations

import os
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
    lesion_intensity: float = 0.75,
    lesion_noise: float = 0.05,
    texture_amp: float = 0.0,
) -> SliceDataset2D:
    """Windowed-intensity [0,1] slices with lesions; returns SliceDataset2D.

    ``texture_amp > 0`` superimposes smooth per-patient low-frequency
    texture (gyri-like structure shared by all slices of a volume), and a
    ``lesion_intensity`` near the 0.35 tissue mean makes lesions
    low-contrast — the "hard" regime used by the label-efficiency
    benchmark, where pretraining that models texture transfers value."""
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
    textures = {}
    if texture_amp > 0.0:
        for v in range(n_volumes):
            t = np.zeros((h, w), dtype=np.float32)
            for _ in range(4):
                fy, fx = rng.uniform(2.0, 7.0, size=2)
                ph = rng.uniform(0, 2 * np.pi, size=2)
                t += np.sin(2 * np.pi * fy * yy / h + ph[0]) * np.sin(
                    2 * np.pi * fx * xx / w + ph[1]
                )
            textures[v] = texture_amp * (t / 4.0).astype(np.float32)
    for i in range(n_slices):
        tissue = 0.35 + 0.08 * rng.standard_normal((h, w)).astype(np.float32)
        if texture_amp > 0.0:
            tissue = tissue + textures[int(vol_ids[i])]
        if rng.uniform() < positive_frac:
            lesion = _lesion_mask_2d(rng, h, w) * brain
        else:
            lesion = np.zeros((h, w), dtype=np.float32)
        img = tissue * brain + 1.0 * skull
        img = np.where(
            lesion > 0,
            lesion_intensity + lesion_noise * rng.standard_normal((h, w)),
            img,
        )
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
    labels[:, 6] = 1.0 - has_ich  # no_Hemorrhage, like gen-rsna-csv's pivot
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
    # patient_info carries the demographics the reference's metadata figure
    # reads (Age / Gender columns, figure_scripts/data_exploration.py:39-58);
    # synthesized deterministically per patient id
    meta_rng = np.random.default_rng(1234)
    pat_rows = []
    for k, v in sorted(patients.items()):
        pat_rows.append({
            "PatientNumber": k,
            "Age": int(meta_rng.integers(18, 95)),
            "Gender": "Male" if meta_rng.uniform() < 0.5 else "Female",
            "Hemorrhage": v,
        })
    pd.DataFrame(pat_rows).to_csv(os.path.join(out_dir, "patient_info.csv"))
    return out_dir


def write_rsna_tree(out_dir: str, n_slices: int = 12, size: int = 32, seed: int = 0) -> str:
    """Write a spec-faithful RSNA stage-2 on-disk fixture:

    - ``stage_2_train/ID_<sop>.dcm`` CT slices (explicit-VR LE, slope 1 /
      intercept -1024 like the real export),
    - ``stage_2_train.csv`` in the raw long label format
      (``ID,Label`` with ``ID = ID_<sop>_<subtype>``, 6 rows per slice)
      including the real dataset's quirks: duplicated label rows and the
      corrupted ``ID_6431af929`` entry the reference drops
      (``generate_RSNA_csv.py:42-44``).

    Returns the path of the label csv. Pipe through the ``gen-rsna-csv``
    CLI to obtain ``slice_info.csv`` for ``load_rsna_slices``."""
    import csv

    from ich_tpu.data.dicom import write_minimal_dicom

    subtypes = ["any", "epidural", "intraparenchymal", "intraventricular",
                "subarachnoid", "subdural"]
    rng = np.random.default_rng(seed)
    ds = synthetic_ich_slices(n_slices=n_slices, size=size, seed=seed)
    dcm_dir = os.path.join(out_dir, "stage_2_train")
    os.makedirs(dcm_dir, exist_ok=True)
    rows = []
    for i in range(n_slices):
        sop = f"{seed:03x}{i:06x}"
        hu = ds.images[i] * 200.0 - 50.0  # back to a HU-like range
        write_minimal_dicom(
            os.path.join(dcm_dir, f"ID_{sop}.dcm"),
            np.round(hu + 1024.0).astype(np.int16),  # stored + intercept
            slope=1.0, intercept=-1024.0,
            position=(0.0, 0.0, float(i) * 5.0),
        )
        has_ich = int(ds.masks[i].max() > 0)
        labels = {"any": has_ich}
        sub = subtypes[1 + int(rng.integers(0, 5))]
        for st in subtypes[1:]:
            labels[st] = has_ich if st == sub else 0
        for st in subtypes:
            rows.append((f"ID_{sop}_{st}", labels[st]))
        if i % 3 == 0:  # the stage-2 csv contains duplicated rows
            rows.append((f"ID_{sop}_any", labels["any"]))
    # the corrupted slice: labels present, no readable pixel data
    for st in subtypes:
        rows.append((f"ID_6431af929_{st}", 0))
    with open(os.path.join(out_dir, "stage_2_train.csv"), "w", newline="") as f:
        wtr = csv.writer(f)
        wtr.writerow(["ID", "Label"])
        wtr.writerows(rows)
    return os.path.join(out_dir, "stage_2_train.csv")


def write_cq500_tree(
    out_dir: str, n_patients: int = 2, n_slices: int = 6, size: int = 32, seed: int = 0
) -> str:
    """Write a spec-faithful qureAI CQ500 root: one DICOM-series directory
    per numeric patient id, file naming NOT in z order (slice position is
    carried by ImagePositionPatient, which ``series_to_volume`` must sort
    by — the real series' instance ordering), plus ``ICH_probabilities.csv``
    indexed by patient id (``qureAI_extract_as_nifti.py:55-60``)."""
    import pandas as pd

    from ich_tpu.data.dicom import write_minimal_dicom

    rng = np.random.default_rng(seed)
    prob_rows = []
    for pid in range(n_patients):
        pdir = os.path.join(out_dir, str(pid))
        os.makedirs(pdir, exist_ok=True)
        ds = synthetic_ich_slices(n_slices=n_slices, size=size, seed=seed + pid)
        order = rng.permutation(n_slices)  # filename order != z order
        for file_idx, z_idx in enumerate(order):
            hu = ds.images[z_idx] * 200.0 - 50.0
            write_minimal_dicom(
                os.path.join(pdir, f"CT-{file_idx:04d}.dcm"),
                np.round(hu + 1024.0).astype(np.int16),
                slope=1.0, intercept=-1024.0,
                spacing=(0.5, 0.5),
                position=(0.0, 0.0, float(z_idx) * 5.0),
            )
        prob_rows.append({"id": pid, "ICH": float(rng.uniform()),
                          "IPH": float(rng.uniform())})
    pd.DataFrame(prob_rows).set_index("id").to_csv(
        os.path.join(out_dir, "ICH_probabilities.csv")
    )
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
