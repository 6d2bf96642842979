"""Native C++ fastload: parity with the pure-Python paths."""

import numpy as np
import pytest

from ich_tpu import native
from ich_tpu.data import nifti

pytestmark = pytest.mark.skipif(not native.available(), reason="no native build")


def test_native_nifti_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.uniform(-100, 200, size=(24, 20, 12)).astype(np.float32)
    fn = str(tmp_path / "v.nii")
    nifti.save(fn, vol, np.diag([0.5, 0.5, 2.5, 1.0]))
    got, pixdim = native.load_nifti_f32(fn)
    want, _, hdr = nifti.load(fn)
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(pixdim, [0.5, 0.5, 2.5], atol=1e-5)


def test_native_nifti_gzip(tmp_path):
    rng = np.random.default_rng(1)
    vol = (rng.uniform(0, 100, size=(8, 8, 4))).astype(np.float32)
    fn = str(tmp_path / "v.nii.gz")
    nifti.save(fn, vol)
    got, _ = native.load_nifti_f32(fn)
    np.testing.assert_allclose(got, vol, atol=1e-5)


def test_native_int16_with_scaling(tmp_path):
    vol = np.arange(-50, 50, dtype=np.int16).reshape(10, 10)
    fn = str(tmp_path / "s.nii")
    nifti.save(fn, vol)
    got, _ = native.load_nifti_f32(fn)
    np.testing.assert_allclose(got, vol.astype(np.float32))


def test_window_resize_matches_python():
    import jax.numpy as jnp

    from ich_tpu.ops import ct

    rng = np.random.default_rng(2)
    slices = rng.uniform(-200, 300, size=(5, 40, 40)).astype(np.float32)
    got = native.window_resize_batch(slices, 50, 200, (24, 24), n_threads=2)
    # python path: window then jax.image linear resize (same half-pixel rule)
    want = np.asarray(
        ct.resize(ct.window_ct(jnp.asarray(slices), 50, 200), (5, 24, 24), order=1)
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_window_resize_identity_size():
    rng = np.random.default_rng(3)
    slices = rng.uniform(-50, 250, size=(3, 16, 16)).astype(np.float32)
    got = native.window_resize_batch(slices, 50, 200, (16, 16))
    want = np.clip((slices - (50 - 100)) / 200.0, 0, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)
