"""Data-layer IO: DICOM roundtrip, NIfTI 3D loader, dataset loaders."""

import os

import numpy as np
import pytest

from ich_tpu.data import nifti
from ich_tpu.data.dicom import (
    DicomError,
    read_ct_hu,
    read_dicom,
    series_to_volume,
    write_minimal_dicom,
)


def test_dicom_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pix = rng.integers(-1000, 2000, size=(32, 32)).astype(np.int16)
    fn = str(tmp_path / "slice.dcm")
    write_minimal_dicom(fn, pix, slope=1.0, intercept=-1024.0, spacing=(0.5, 0.5))
    d = read_dicom(fn)
    np.testing.assert_array_equal(d["pixel_array"], pix)
    assert d["RescaleIntercept"] == -1024.0
    assert d["PixelSpacing"] == [0.5, 0.5]
    hu = read_ct_hu(fn)
    np.testing.assert_allclose(hu, pix.astype(np.float32) - 1024.0)


def test_dicom_series_to_volume(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    for z in [10.0, 0.0, 5.0]:  # deliberately unsorted
        fn = str(tmp_path / f"s{z}.dcm")
        write_minimal_dicom(fn, rng.integers(0, 100, size=(16, 16)).astype(np.int16),
                            position=(0, 0, z))
        paths.append(fn)
    vol, affine = series_to_volume(paths)
    assert vol.shape == (16, 16, 3)
    np.testing.assert_allclose(affine[2, 2], 5.0)  # sorted spacing 0,5,10
    np.testing.assert_allclose(affine[2, 3], 0.0)  # first slice at z=0


def test_dicom_rejects_garbage(tmp_path):
    fn = str(tmp_path / "bad.dcm")
    with open(fn, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM")
        # declare a compressed transfer syntax
        import struct
        val = b"1.2.840.10008.1.2.4.70"
        f.write(struct.pack("<HH", 2, 0x10) + b"UI" + struct.pack("<H", len(val)) + val)
    with pytest.raises(DicomError):
        read_dicom(fn)


def test_load_segich_3d(tmp_path):
    from ich_tpu.data.datasets import load_segich_3d
    from ich_tpu.data.synthetic import synthetic_ich_volume

    os.makedirs(tmp_path / "ct_scans")
    os.makedirs(tmp_path / "masks")
    for pid in (1, 2):
        vol, mask = synthetic_ich_volume(size=32, depth=12, seed=pid)
        affine = np.diag([0.5, 0.5, 5.0, 1.0])
        nifti.save(str(tmp_path / "ct_scans" / f"{pid:03}.nii"), vol, affine)
        nifti.save(str(tmp_path / "masks" / f"{pid:03}.nii"), mask.astype(np.uint8), affine)

    ds = load_segich_3d(str(tmp_path), [1, 2], window=(50, 200), out_spacing=(-1, -1, 2.5))
    assert len(ds) == 2
    # z resampled from 5.0mm to 2.5mm: 12 -> 24 slices; xy kept (-1)
    assert ds.volumes[0].shape == (24, 32, 32)
    assert ds.masks[0].shape == (24, 32, 32)
    assert set(np.unique(ds.masks[0])) <= {0.0, 1.0}
    assert 0 <= ds.volumes[0].min() and ds.volumes[0].max() <= 1


def test_load_rsna_slices(tmp_path):
    import pandas as pd

    rng = np.random.default_rng(2)
    rows = []
    for i in range(4):
        fn = f"im{i}.dcm"
        write_minimal_dicom(str(tmp_path / fn),
                            rng.integers(-100, 200, size=(24, 24)).astype(np.int16))
        rows.append({"filename": fn, "Hemorrhage": i % 2, "epidural": 0,
                     "intraparenchymal": i % 2, "intraventricular": 0,
                     "subarachnoid": 0, "subdural": 0, "no_Hemorrhage": 1 - i % 2})
    df = pd.DataFrame(rows)
    ds = load_rsna = __import__("ich_tpu.data.datasets", fromlist=["load_rsna_slices"]).load_rsna_slices(
        str(tmp_path), slice_df=df, size=32
    )
    assert ds.images.shape == (4, 32, 32)
    assert ds.labels.shape == (4, 7)
    np.testing.assert_array_equal(ds.labels[:, 0], [0, 1, 0, 1])
    assert 0 <= ds.images.min() and ds.images.max() <= 1


def test_load_img_mask_pairs(tmp_path):
    from PIL import Image

    from ich_tpu.data.datasets import load_img_mask_pairs

    rng = np.random.default_rng(3)
    pairs = []
    for i in range(2):
        im = (rng.uniform(size=(20, 20)) * 255).astype(np.uint8)
        mk = (rng.uniform(size=(20, 20)) > 0.7).astype(np.uint8) * 255
        imf, mkf = str(tmp_path / f"i{i}.png"), str(tmp_path / f"m{i}.bmp")
        Image.fromarray(im).save(imf)
        Image.fromarray(mk).save(mkf)
        pairs.append((imf, mkf))
    ds = load_img_mask_pairs(pairs, size=16)
    assert ds.images.shape == (2, 16, 16)
    assert set(np.unique(ds.masks)) <= {0.0, 1.0}


def test_load_segich_attention(tmp_path):
    import pandas as pd
    from PIL import Image

    from ich_tpu.data.datasets import load_segich_attention_2d

    rng = np.random.default_rng(4)
    rows = []
    for i in range(3):
        im = (rng.uniform(size=(24, 24)) * 2000 - 500).astype(np.int32)
        Image.fromarray(im, mode="I").save(str(tmp_path / f"ct{i}.tif"))
        att = (rng.uniform(size=(24, 24)) * 255).astype(np.uint8)
        Image.fromarray(att).save(str(tmp_path / f"att{i}.png"))
        rows.append({"PatientNumber": i, "SliceNumber": 0, "CT_fn": f"ct{i}.tif",
                     "mask_fn": "-", "attention_fn": f"att{i}.png"})
    ds = load_segich_attention_2d(str(tmp_path), pd.DataFrame(rows), size=32)
    assert ds.images.shape == (3, 32, 32, 2)
    assert ds.images[..., 1].max() <= 1.0


def test_nifti_scl_slope_zero_ignores_inter(tmp_path):
    """NIfTI-1 spec: scl_slope == 0 -> no scaling at all; a garbage
    scl_inter must not shift the voxel values. Output is writable."""
    import struct

    from ich_tpu.data import nifti

    fn = str(tmp_path / "v.nii")
    vol = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    nifti.save(fn, vol)
    raw = bytearray(open(fn, "rb").read())
    struct.pack_into("<f", raw, 112, 0.0)    # scl_slope = 0
    struct.pack_into("<f", raw, 116, 123.0)  # garbage scl_inter
    open(fn, "wb").write(bytes(raw))

    data, _, hdr = nifti.load(fn)
    np.testing.assert_array_equal(data.reshape(-1), np.arange(8, dtype=np.float32))
    data *= 2.0  # writable (frombuffer views used to be read-only)
