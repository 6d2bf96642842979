"""On-device 3D patch sampler: bounds, foreground-oversampling semantics,
and trainer integration (mirrors the host sample_patches behavior)."""

import jax
import jax.numpy as jnp
import numpy as np

from ich_tpu.data.core import VolumeDataset3D
from ich_tpu.data.patch_sampler import DevicePatchSampler


def _dataset(seed=0):
    """Three ragged volumes; volume i is constant i+1 inside its extent."""
    rng = np.random.default_rng(seed)
    vols, msks = [], []
    for i, shape in enumerate([(12, 20, 20), (8, 16, 24), (16, 20, 16)]):
        v = np.full(shape, float(i + 1), np.float32)
        m = np.zeros(shape, np.float32)
        # one positive blob per volume
        c = tuple(rng.integers(2, s - 2) for s in shape)
        m[c] = 1.0
        vols.append(v)
        msks.append(m)
    return VolumeDataset3D(vols, msks, np.arange(3))


def test_patches_stay_inside_volumes():
    ds = _dataset()
    s = DevicePatchSampler(ds, (8, 16, 16), pos_frac=0.5)
    imgs, msks = s(jax.random.PRNGKey(0), 64)
    assert imgs.shape == (64, 8, 16, 16) and msks.shape == (64, 8, 16, 16)
    iv = np.asarray(imgs)
    # every patch comes from exactly one volume; patches may only contain
    # zero padding when that volume's extent was padded up to the patch
    for p in iv:
        vals = set(np.unique(p)) - {0.0}
        assert len(vals) == 1, vals
        vid = int(vals.pop()) - 1
        if all(s0 >= ps for s0, ps in zip(ds.volumes[vid].shape, (8, 16, 16))):
            assert not (p == 0).any()
    # all volumes get sampled
    seen = {int(v) for p in iv for v in np.unique(p) if v > 0}
    assert seen == {1, 2, 3}


def test_pos_frac_one_always_contains_positive():
    ds = _dataset()
    s = DevicePatchSampler(ds, (8, 16, 16), pos_frac=1.0)
    _, msks = s(jax.random.PRNGKey(1), 32)
    m = np.asarray(msks)
    assert (m.reshape(32, -1).max(axis=1) == 1.0).all()


def test_pos_frac_zero_is_uniform():
    ds = _dataset()
    s = DevicePatchSampler(ds, (8, 16, 16), pos_frac=0.0)
    _, msks = s(jax.random.PRNGKey(2), 64)
    # single positive voxel per volume: uniform patches rarely hit it
    assert np.asarray(msks).mean() < 0.01


def test_trainer_integration_on_device():
    from ich_tpu.models.unet import UNet
    from ich_tpu.train.segmentation3d import UNet3D

    ds = _dataset()
    net = UNet(depth=2, ndim=3, top_filter=4, p_dropout=0.0, norm="group")
    tr = UNet3D(net, patch_size=(8, 16, 16), steps_per_epoch=2, n_epoch=1,
                batch_size=2, lr=1e-3, loss_fn="BinaryDiceLoss",
                loss_fn_kwargs={"reduction": "mean"},
                on_device_sampling=True)
    tr.train(ds)
    assert np.isfinite(tr.outputs["train"]["evolution"][-1][1])
