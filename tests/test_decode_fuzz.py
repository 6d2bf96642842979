"""Decode-robustness fuzzing for the NIfTI/DICOM loaders.

The watch-folder server (scripts/serve.py) feeds arbitrary uploads to
these decoders with per-file isolation: a malformed file must surface as a
clean Python exception — never a crash, hang, or silent huge allocation.
Deterministic mutation fuzz (seeded): flip bytes in valid files' headers
and bodies, truncate, and assert every outcome is load-or-raise on both
the pure-Python path (ich_tpu.data.{nifti,dicom}) and the native C++ fast
path (ich_tpu.native). No reference equivalent — the reference delegates
decoding to nibabel/pydicom and has no server mode.
"""

import numpy as np
import pytest

from ich_tpu import native
from ich_tpu.data import dicom, nifti

N_MUTATIONS = 150


def _mutations(rng, data: bytes, n: int):
    """Yield n deterministic corruptions: single/multi byte flips biased
    toward the header, plus truncations."""
    buf = bytearray(data)
    for i in range(n):
        kind = i % 4
        if kind == 0:  # single byte flip in the header region
            m = bytearray(buf)
            pos = int(rng.integers(0, min(360, len(m))))
            m[pos] ^= int(rng.integers(1, 256))
            yield bytes(m)
        elif kind == 1:  # burst of flips anywhere
            m = bytearray(buf)
            for _ in range(8):
                pos = int(rng.integers(0, len(m)))
                m[pos] ^= int(rng.integers(1, 256))
            yield bytes(m)
        elif kind == 2:  # truncation
            yield bytes(buf[: int(rng.integers(0, len(buf)))])
        else:  # garbage prefix of the original length
            yield bytes(rng.integers(0, 256, size=len(buf), dtype=np.uint8))


@pytest.fixture(scope="module")
def nifti_bytes(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz")
    vol = np.random.default_rng(0).uniform(-100, 200, size=(12, 10, 6)).astype(np.float32)
    fn = str(d / "v.nii")
    nifti.save(fn, vol, np.diag([0.5, 0.5, 2.5, 1.0]))
    with open(fn, "rb") as f:
        return f.read()


def test_python_nifti_fuzz(nifti_bytes, tmp_path):
    rng = np.random.default_rng(42)
    fn = str(tmp_path / "m.nii")
    for m in _mutations(rng, nifti_bytes, N_MUTATIONS):
        with open(fn, "wb") as f:
            f.write(m)
        try:
            vol, _, _ = nifti.load(fn)
            # survived decode: result must be a sane finite-size array
            assert vol.size <= 10_000_000
        except Exception as e:  # noqa: BLE001 — any CLEAN exception is a pass
            assert not isinstance(e, (MemoryError, SystemError)), e
    # determinism sanity: the original still loads
    with open(fn, "wb") as f:
        f.write(nifti_bytes)
    vol, _, _ = nifti.load(fn)
    assert vol.shape == (12, 10, 6)


@pytest.mark.skipif(not native.available(), reason="no native build")
def test_native_nifti_fuzz(nifti_bytes, tmp_path):
    """The C++ decoder must reject corruption with ValueError/OSError —
    an out-of-bounds read here would crash the whole serving process."""
    rng = np.random.default_rng(43)
    fn = str(tmp_path / "m.nii")
    for m in _mutations(rng, nifti_bytes, N_MUTATIONS):
        with open(fn, "wb") as f:
            f.write(m)
        try:
            vol, _ = native.load_nifti_f32(fn)
            assert vol.size <= 10_000_000
        except (ValueError, OSError, RuntimeError):
            pass
    with open(fn, "wb") as f:
        f.write(nifti_bytes)
    vol, _ = native.load_nifti_f32(fn)
    assert vol.shape == (12, 10, 6)


def test_dicom_fuzz(tmp_path):
    rng = np.random.default_rng(44)
    fn = str(tmp_path / "m.dcm")
    px = (np.random.default_rng(1).integers(0, 1000, size=(16, 16))).astype(np.int16)
    dicom.write_minimal_dicom(fn, px, slope=1.0, intercept=-1024.0)
    with open(fn, "rb") as f:
        data = f.read()
    for m in _mutations(rng, data, N_MUTATIONS):
        with open(fn, "wb") as f:
            f.write(m)
        try:
            hu = dicom.read_ct_hu(fn)
            assert hu.size <= 10_000_000
        except Exception as e:  # noqa: BLE001
            assert not isinstance(e, (MemoryError, SystemError)), e
    with open(fn, "wb") as f:
        f.write(data)
    assert dicom.read_ct_hu(fn).shape == (16, 16)
