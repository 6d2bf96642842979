import pytest
import numpy as np
import jax
import jax.numpy as jnp
import scipy.ndimage as ndi

from ich_tpu.ops.transforms3d import Compose3D, Flip3D, RotateInPlane, default_patch_augmentation

KEY = jax.random.PRNGKey(0)


def test_flip3d():
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.uniform(size=(4, 6, 8, 8)).astype(np.float32))
    mask = (vol > 0.5).astype(jnp.float32)
    t = Flip3D(p=1.0, axes=(2, 3))
    oi, om = t(KEY, vol, mask)
    want = np.flip(np.flip(np.asarray(vol), 2), 3)
    np.testing.assert_allclose(np.asarray(oi), want, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(om), np.flip(np.flip(np.asarray(mask), 2), 3))
    # p=0 identity
    oi0 = Flip3D(p=0.0)(KEY, vol)
    np.testing.assert_allclose(np.asarray(oi0), np.asarray(vol), atol=1e-6)


def test_rotate_in_plane_matches_scipy_per_slice():
    rng = np.random.default_rng(1)
    vol = ndi.gaussian_filter(rng.uniform(size=(1, 4, 32, 32)).astype(np.float32), 1.5)
    t = RotateInPlane(low=15.0, high=15.0)
    out = np.asarray(t(KEY, jnp.asarray(vol)))
    for z in range(4):
        want = ndi.rotate(vol[0, z], 15.0, axes=(1, 0), order=1, reshape=False)
        d = np.abs(out[0, z, 4:-4, 4:-4] - want[4:-4, 4:-4])
        assert d.max() < 0.05  # two-pass warp tolerance on smooth data


def test_rotate_in_plane_mask_binary():
    rng = np.random.default_rng(2)
    vol = jnp.asarray(rng.uniform(size=(2, 4, 16, 16)).astype(np.float32))
    mask = (vol > 0.7).astype(jnp.float32)
    oi, om = RotateInPlane(-20, 20)(KEY, vol, mask)
    assert set(np.unique(np.asarray(om))) <= {0.0, 1.0}
    assert oi.shape == vol.shape and om.shape == mask.shape


@pytest.mark.slow
def test_default_patch_augmentation_in_unet3d():
    from ich_tpu.data import VolumeDataset3D, synthetic_ich_volume
    from ich_tpu.models import UNet
    from ich_tpu.train import UNet3D

    vols, masks = [], []
    for i in range(2):
        v, m = synthetic_ich_volume(size=24, depth=16, seed=i)
        vols.append(np.transpose(v, (2, 0, 1)) / 200.0 + 0.25)
        masks.append(np.transpose(m, (2, 0, 1)))
    ds = VolumeDataset3D(vols, masks, np.arange(2))
    t = UNet3D(
        UNet(depth=2, ndim=3, top_filter=4, p_dropout=0.0, norm="group"),
        patch_size=(8, 16, 16), steps_per_epoch=3, n_epoch=1, batch_size=4,
        lr=1e-3, augment_fn=default_patch_augmentation(),
        loss_fn_kwargs={"reduction": "mean", "p": 2, "alpha": 0.2},
    )
    t.train(ds)
    assert np.isfinite(t.outputs["train"]["evolution"][0][1])


def test_inplane_warp_matmul_matches_per_slab():
    """Depth-as-matmul-N formulation == per-slab affine_warp_matmul (same
    two-pass math, different contraction layout)."""
    from ich_tpu.ops.warp import affine_warp_matmul, inplane_warp_matmul

    rng = np.random.default_rng(3)
    vol = jnp.asarray(rng.uniform(size=(2, 4, 16, 16)).astype(np.float32))
    th = np.deg2rad(12.0)
    m = jnp.broadcast_to(
        jnp.asarray([[np.cos(th), np.sin(th)], [-np.sin(th), np.cos(th)]], jnp.float32),
        (2, 2, 2),
    )
    o = jnp.asarray(np.tile([[1.2, -0.7]], (2, 1)), jnp.float32)
    got = np.asarray(inplane_warp_matmul(vol, m, o, order=1))
    b, d, h, w = vol.shape
    flat = vol.reshape(b * d, h, w)
    m_s = jnp.repeat(m, d, axis=0)
    o_s = jnp.repeat(o, d, axis=0)
    want = np.asarray(affine_warp_matmul(flat, m_s, o_s, order=1)).reshape(vol.shape)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # order-0 masks stay binary and agree too
    mask = (vol > 0.6).astype(jnp.float32)
    g0 = np.asarray(inplane_warp_matmul(mask, m, o, order=0))
    w0 = np.asarray(affine_warp_matmul(mask.reshape(b * d, h, w), m_s, o_s, order=0)).reshape(vol.shape)
    assert set(np.unique(g0)) <= {0.0, 1.0}
    np.testing.assert_array_equal(g0, w0)


def test_affine_augment3d_fused_flips_exact():
    """With rotation pinned to 0 and p_flip=1, the fused warp must equal
    plain H+W flips exactly (shear-free -> bit-exact, incl. the mask)."""
    from ich_tpu.ops.transforms3d import AffineAugment3D

    rng = np.random.default_rng(4)
    vol = jnp.asarray(rng.uniform(size=(3, 4, 8, 8)).astype(np.float32))
    mask = (vol > 0.5).astype(jnp.float32)
    t = AffineAugment3D(rotate=(0.0, 0.0), p_flip=1.0)
    oi, om = t(KEY, vol, mask)
    want_i = np.flip(np.flip(np.asarray(vol), 2), 3)
    np.testing.assert_allclose(np.asarray(oi), want_i, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(om), np.flip(np.flip(np.asarray(mask), 2), 3))


def test_affine_augment3d_randomized_properties():
    from ich_tpu.ops.transforms3d import AffineAugment3D

    rng = np.random.default_rng(5)
    vol = jnp.asarray(rng.uniform(size=(4, 6, 16, 16)).astype(np.float32))
    mask = (vol > 0.7).astype(jnp.float32)
    oi, om = AffineAugment3D(rotate=(-15, 15))(KEY, vol, mask)
    assert oi.shape == vol.shape and om.shape == mask.shape
    assert set(np.unique(np.asarray(om))) <= {0.0, 1.0}
    # different keys give different augmentations
    oi2, _ = AffineAugment3D(rotate=(-15, 15))(jax.random.PRNGKey(9), vol, mask)
    assert not np.allclose(np.asarray(oi), np.asarray(oi2))


def test_inplane_warp_matmul_channel_axis():
    """(B, D, H, W, C) inputs warp identically per channel and match the
    channel-less path."""
    from ich_tpu.ops.warp import inplane_warp_matmul

    rng = np.random.default_rng(7)
    vol = jnp.asarray(rng.uniform(size=(2, 3, 12, 12)).astype(np.float32))
    th = np.deg2rad(8.0)
    m = jnp.broadcast_to(
        jnp.asarray([[np.cos(th), np.sin(th)], [-np.sin(th), np.cos(th)]], jnp.float32),
        (2, 2, 2),
    )
    o = jnp.zeros((2, 2))
    base = np.asarray(inplane_warp_matmul(vol, m, o, order=1))
    withc = np.asarray(inplane_warp_matmul(vol[..., None], m, o, order=1))
    assert withc.shape == vol.shape + (1,)
    np.testing.assert_allclose(withc[..., 0], base, atol=1e-6)
    two = np.asarray(inplane_warp_matmul(jnp.stack([vol, 2 * vol], -1), m, o, order=1))
    np.testing.assert_allclose(two[..., 1], 2 * base, atol=1e-5)


def test_mask_warp_policy_wide_angles(monkeypatch):
    """Wide rotation bounds route 3D mask warps to the exact nearest gather
    even on TPU (the 2D mask_warp_method policy, applied in 3D)."""
    import ich_tpu.ops.warp as warp
    from ich_tpu.ops.transforms3d import RotateInPlane, _mask_warp_inplane

    monkeypatch.setattr(warp, "_use_matmul_warp", lambda: True)  # pretend TPU

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.uniform(size=(2, 4, 16, 16)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(2, 4, 16, 16)) > 0.7).astype(np.float32))

    # narrow bound -> matmul; wide bound -> gather (exact nearest)
    assert warp.mask_warp_method(10.0) == "matmul"
    assert warp.mask_warp_method(90.0) == "gather"

    m, o = jnp.tile(jnp.eye(2), (2, 1, 1)), jnp.zeros((2, 2))
    out_narrow = _mask_warp_inplane(mask, m, o, 10.0)
    out_wide = _mask_warp_inplane(mask, m, o, 90.0)
    # identity map: both paths must reproduce the mask exactly
    np.testing.assert_array_equal(np.asarray(out_narrow), np.asarray(mask))
    np.testing.assert_array_equal(np.asarray(out_wide), np.asarray(mask))

    # a real wide rotation keeps masks exactly binary through the gather path
    r = RotateInPlane(low=80, high=80)
    _, mw = r(jax.random.PRNGKey(0), vol, mask)
    assert set(np.unique(np.asarray(mw))) <= {0.0, 1.0}
