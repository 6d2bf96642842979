import numpy as np
import jax.numpy as jnp
import scipy.ndimage as ndi

from ich_tpu.ops.distance import distance_to_set, distance_transform_edt


def test_edt_matches_scipy():
    rng = np.random.default_rng(0)
    mask = (rng.uniform(size=(32, 32)) > 0.8).astype(np.float32)
    mask[0, 0] = 0  # ensure a zero exists
    got = np.asarray(distance_transform_edt(jnp.asarray(mask)))
    want = ndi.distance_transform_edt(mask)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_edt_batched():
    rng = np.random.default_rng(1)
    masks = (rng.uniform(size=(3, 16, 16)) > 0.7).astype(np.float32)
    masks[:, 0, 0] = 0
    got = np.asarray(distance_transform_edt(jnp.asarray(masks)))
    for i in range(3):
        np.testing.assert_allclose(got[i], ndi.distance_transform_edt(masks[i]), atol=1e-4)


def test_distance_to_set():
    site = np.zeros((8, 8), dtype=np.float32)
    site[4, 4] = 1
    d = np.asarray(distance_to_set(jnp.asarray(site)))
    assert d[4, 4] == 0
    np.testing.assert_allclose(d[4, 6], 2.0, atol=1e-5)
    np.testing.assert_allclose(d[7, 7], np.sqrt(18), atol=1e-4)
