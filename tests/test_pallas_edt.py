import numpy as np
import jax
import jax.numpy as jnp
import scipy.ndimage as ndi

from ich_tpu.ops.distance import distance_transform_edt
from ich_tpu.ops.pallas_edt import distance_transform_edt_pallas, edt_pass_1d


def test_minplus_pass_matches_dense():
    rng = np.random.default_rng(0)
    g = np.where(rng.uniform(size=(13, 128)) > 0.9, 0.0, 1e10).astype(np.float32)
    got = np.asarray(edt_pass_1d(jnp.asarray(g), interpret=True))
    x = np.arange(128, dtype=np.float32)
    d2 = (x[:, None] - x[None, :]) ** 2
    want = (g[:, None, :] + d2[None]).min(-1)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_pallas_edt_matches_scipy():
    rng = np.random.default_rng(1)
    mask = (rng.uniform(size=(32, 32)) > 0.85).astype(np.float32)
    mask[0, 0] = 0
    got = np.asarray(distance_transform_edt_pallas(jnp.asarray(mask)))
    want = ndi.distance_transform_edt(mask)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_pallas_edt_matches_jnp_batched():
    rng = np.random.default_rng(2)
    masks = (rng.uniform(size=(3, 24, 24)) > 0.8).astype(np.float32)
    masks[:, 0, 0] = 0
    a = np.asarray(distance_transform_edt_pallas(jnp.asarray(masks)))
    b = np.asarray(distance_transform_edt(jnp.asarray(masks)))
    np.testing.assert_allclose(a, b, atol=1e-3)
