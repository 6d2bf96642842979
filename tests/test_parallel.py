"""Multi-device tests on the virtual 8-device CPU mesh: data-parallel
training, cross-device contrastive negatives, and spatially-sharded
sliding-window inference with halo exchange."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ich_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(jax.devices()[:8], axis_names=("data",))


@pytest.mark.slow
def test_data_parallel_train_step(mesh):
    """The UNet2D jitted step under a batch-sharded layout: loss finite and
    numerically equal to the single-device result."""
    from ich_tpu.models import UNet
    from ich_tpu.train.segmentation2d import UNet2D

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(16, 32, 32)).astype(np.float32))
    masks = jnp.asarray((rng.uniform(size=(16, 32, 32)) > 0.8).astype(np.float32))

    def loss_after_step(shard):
        t = UNet2D(UNet(depth=3, top_filter=4, p_dropout=0.0, norm="group"),
                   batch_size=16, lr=1e-3, seed=0)
        t._ensure_state((32, 32), 1)
        step = t._make_train_step()
        state = t.state
        bi, bm = imgs, masks
        if shard:
            state = jax.device_put(state, replicated_sharding(mesh))
            bi = jax.device_put(bi, batch_sharding(mesh, 3))
            bm = jax.device_put(bm, batch_sharding(mesh, 3))
        state, loss = step(state, bi, bm, jax.random.PRNGKey(0))
        _, loss2 = step(state, bi, bm, jax.random.PRNGKey(1))
        return float(loss), float(loss2)

    l_single = loss_after_step(False)
    l_shard = loss_after_step(True)
    np.testing.assert_allclose(l_shard, l_single, rtol=1e-4)


def test_info_nce_cross_device_negatives(mesh):
    """info_nce_loss(axis_name=...) under shard_map gathers negatives
    across the mesh: the sharded global loss equals the unsharded loss on
    the concatenated batch."""
    from jax import shard_map

    from ich_tpu.ops.losses import info_nce_loss

    rng = np.random.default_rng(1)
    z1 = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))

    global_loss = float(info_nce_loss(z1, z2, tau=0.5))

    def local(a, b):
        return info_nce_loss(a, b, tau=0.5, axis_name="data")

    fn = shard_map(local, mesh=mesh, in_specs=(P("data"), P("data")),
                   out_specs=P(), check_vma=False)
    sharded_loss = float(jax.jit(fn)(z1, z2))
    np.testing.assert_allclose(sharded_loss, global_loss, rtol=1e-5)


def test_sharded_sliding_window_identity(mesh):
    """Identity network: the halo-exchange sharded blend reproduces the
    input exactly (weights normalize out)."""
    from ich_tpu.parallel.sharded_inference import sliding_window_inference_sharded

    rng = np.random.default_rng(2)
    vol = rng.uniform(size=(16, 64, 16)).astype(np.float32)
    out = sliding_window_inference_sharded(
        lambda v, x: x, {}, jnp.asarray(vol), mesh,
        patch_size=(8, 8, 8), overlap=0.5, batch_size=4,
    )
    np.testing.assert_allclose(np.asarray(out)[..., 0], vol, atol=1e-4)


def test_sharded_sliding_window_overlap_zero(mesh):
    """overlap=0 means halo=0: no boundary patches straddle devices, so no
    halo exchange — the old code sliced vol_slab[:, -0:] (the WHOLE slab)
    and silently returned every device's output H-shifted by one slab."""
    from ich_tpu.parallel.sharded_inference import sliding_window_inference_sharded

    rng = np.random.default_rng(5)
    vol = rng.uniform(size=(8, 64, 8)).astype(np.float32)
    out = sliding_window_inference_sharded(
        lambda v, x: x, {}, jnp.asarray(vol), mesh,
        patch_size=(8, 8, 8), overlap=0.0, batch_size=4,
    )
    np.testing.assert_allclose(np.asarray(out)[..., 0], vol, atol=1e-4)


def test_shard_batch_replicates_scalar_leaves(mesh):
    """0-d leaves (step counters, loss weights) have no batch axis to split
    and must be replicated, not crash with an IndexError."""
    from ich_tpu.parallel.mesh import shard_batch

    batch = {"x": np.ones((8, 4), np.float32), "w": np.float32(3.0)}
    placed = shard_batch(batch, mesh)
    assert placed["x"].shape == (8, 4)
    assert float(placed["w"]) == 3.0


def test_volume_parallel_map_empty_input(mesh):
    """An empty request yields nothing (serving paths can see empty
    batches) instead of IndexError on volumes[0]."""
    from ich_tpu.parallel.sharded_inference import volume_parallel_map

    assert list(volume_parallel_map(lambda v, x: x, {}, [], mesh)) == []


@pytest.mark.slow
def test_sharded_sliding_window_matches_single_device(mesh):
    """With a real conv net, the sharded result matches the single-device
    path away from the global H edges (edge patch grids may differ by one
    stride; blending normalizes both)."""
    from ich_tpu.models import UNet
    from ich_tpu.ops.sliding_window import sliding_window_inference
    from ich_tpu.parallel.sharded_inference import sliding_window_inference_sharded

    net = UNet(depth=2, ndim=3, top_filter=4, p_dropout=0.0, norm="group")
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 1)))
    apply_fn = lambda v, x: net.apply(v, x, train=False)
    rng = np.random.default_rng(3)
    vol = jnp.asarray(rng.uniform(size=(16, 64, 16)).astype(np.float32))

    single = sliding_window_inference(apply_fn, variables, vol,
                                      patch_size=(8, 8, 8), overlap=0.5, batch_size=8)
    sharded = sliding_window_inference_sharded(apply_fn, variables, vol, mesh,
                                               patch_size=(8, 8, 8), overlap=0.5,
                                               batch_size=8)
    a, b = np.asarray(single), np.asarray(sharded)
    assert a.shape == b.shape
    np.testing.assert_allclose(a[:, 8:-8], b[:, 8:-8], atol=2e-3)


def test_volume_parallel_inference_matches_single_device(mesh):
    """One volume per device (plus lax.map for >1/device and tail padding):
    exactly the single-volume program per chip, so outputs must be
    bit-comparable to the serial per-volume loop."""
    from ich_tpu.models import UNet
    from ich_tpu.ops.sliding_window import sliding_window_inference
    from ich_tpu.parallel.sharded_inference import (
        sliding_window_inference_volume_parallel,
    )

    net = UNet(depth=2, ndim=3, top_filter=4, p_dropout=0.0, norm="group")
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 1)))
    apply_fn = lambda v, x: net.apply(v, x, train=False)
    rng = np.random.default_rng(4)
    # N=11: not a multiple of 8 (exercises tail padding) and >8 (lax.map)
    vols = jnp.asarray(rng.uniform(size=(11, 8, 16, 16)).astype(np.float32))

    par = sliding_window_inference_volume_parallel(
        apply_fn, variables, vols, mesh,
        patch_size=(8, 8, 8), overlap=0.5, batch_size=4,
    )
    assert par.shape[:1] == (11,)
    for i in (0, 7, 10):
        single = sliding_window_inference(
            apply_fn, variables, vols[i],
            patch_size=(8, 8, 8), overlap=0.5, batch_size=4,
        )
        np.testing.assert_allclose(
            np.asarray(par[i]), np.asarray(single), atol=1e-5
        )


@pytest.mark.slow
def test_trainer_mesh_argument(mesh):
    """UNet2D(mesh=...) trains data-parallel end to end via the public API."""
    from ich_tpu.data import synthetic_ich_slices
    from ich_tpu.models import UNet
    from ich_tpu.train import UNet2D

    data = synthetic_ich_slices(n_slices=32, size=32, n_volumes=4, seed=0)
    t = UNet2D(UNet(depth=3, top_filter=4, p_dropout=0.0, norm="group"),
               n_epoch=2, batch_size=16, lr=1e-3, mesh=mesh)
    t.train(data)
    hist = t.outputs["train"]["evolution"]
    assert len(hist) == 2 and np.isfinite(hist[-1][1])
    assert hist[-1][1] < hist[0][1] * 1.2


@pytest.mark.slow
def test_ssl_trainers_mesh(mesh):
    """Contrastive + classifier pretraining under the mesh (dp via the
    public mesh= argument)."""
    from ich_tpu.data import LabeledSliceDataset, synthetic_ich_slices, synthetic_rsna_slices
    from ich_tpu.models import UNetEncoder
    from ich_tpu.train import BinaryClassifier, Contrastive

    data = synthetic_ich_slices(n_slices=32, size=32, n_volumes=4, seed=1)
    enc = UNetEncoder(depth=3, top_filter=4, mlp_head=(16, 8), p_dropout=0.0, norm="group")
    c = Contrastive(enc, is_global=True, n_epoch=1, batch_size=16, lr=1e-3, mesh=mesh)
    c.train(data)
    assert np.isfinite(c.outputs["train"]["evolution"][0][1])

    ds = synthetic_rsna_slices(n_slices=32, size=32, seed=2)
    bd = LabeledSliceDataset(ds.images, ds.labels[:, 0].astype(np.int32))
    enc2 = UNetEncoder(depth=3, top_filter=4, mlp_head=(16, 2), p_dropout=0.0, norm="group")
    clf = BinaryClassifier(enc2, n_epoch=1, batch_size=16, lr=1e-3, mesh=mesh)
    clf.train(bd)
    assert np.isfinite(clf.outputs["train"]["evolution"][0][1])


@pytest.mark.slow
def test_graft_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_trainer_mesh_channel_images_channelless_masks(mesh):
    """(N, H, W, C) images with (N, H, W) masks under a mesh: each array
    gets a rank-specific sharding (this combination used to crash
    device_put on the first batch)."""
    from ich_tpu.data import synthetic_ich_slices
    from ich_tpu.data.core import SliceDataset2D
    from ich_tpu.models import UNet
    from ich_tpu.train import UNet2D

    base = synthetic_ich_slices(n_slices=32, size=32, n_volumes=4, seed=1)
    data = SliceDataset2D(
        images=np.asarray(base.images)[..., None],  # add a channel axis
        masks=np.asarray(base.masks),
        vol_ids=base.vol_ids, slice_nbrs=base.slice_nbrs,
    )
    t = UNet2D(UNet(depth=3, top_filter=4, p_dropout=0.0, norm="group"),
               n_epoch=1, batch_size=16, lr=1e-3, mesh=mesh)
    t.train(data)
    hist = t.outputs["train"]["evolution"]
    assert len(hist) == 1 and np.isfinite(hist[-1][1])


@pytest.mark.slow
def test_unet3d_trainer_mesh(mesh):
    """UNet3D(mesh=...) trains data-parallel (it used to silently ignore
    the mesh and train on one device)."""
    import jax.numpy as jnp

    from ich_tpu.data.core import VolumeDataset3D
    from ich_tpu.models import UNet
    from ich_tpu.train import UNet3D

    rng = np.random.default_rng(0)
    vols = [rng.uniform(size=(8, 16, 16)).astype(np.float32) for _ in range(3)]
    msks = [(rng.uniform(size=(8, 16, 16)) > 0.8).astype(np.float32) for _ in range(3)]
    ds = VolumeDataset3D(volumes=vols, masks=msks, vol_ids=np.arange(3))
    t = UNet3D(UNet(depth=2, ndim=3, top_filter=4, p_dropout=0.0, norm="group"),
               patch_size=(8, 8, 8), steps_per_epoch=4, n_epoch=2,
               batch_size=8, lr=1e-3, loss_fn="BinaryDiceLoss",
               loss_fn_kwargs={"reduction": "mean"}, mesh=mesh)
    t.train(ds)
    hist = t.outputs["train"]["evolution"]
    assert len(hist) == 2 and np.isfinite(hist[-1][1])
    # params actually live replicated on the mesh
    leaf = jax.tree_util.tree_leaves(t.state.params)[0]
    assert len(leaf.sharding.device_set) == 8


@pytest.mark.slow
def test_mesh_resume_replaces_state_on_mesh(mesh, tmp_path):
    """Resuming a mesh run from the msgpack (host-side) store must re-place
    the restored state on the mesh (loop.fit's place_state hook): training
    continues and the final params are replicated over all 8 devices."""

    from ich_tpu.data.core import SliceDataset2D
    from ich_tpu.models import UNet
    from ich_tpu.train.ssl import ContextRestoration

    rng = np.random.default_rng(3)
    imgs = rng.uniform(size=(16, 32, 32)).astype(np.float32)
    ds = SliceDataset2D(images=imgs, masks=np.zeros_like(imgs),
                        vol_ids=np.zeros(16, int), slice_nbrs=np.arange(16))
    path = str(tmp_path / "cr_ckpt.bin")

    def trainer(n_epoch):
        return ContextRestoration(
            UNet(depth=3, top_filter=4, p_dropout=0.0, norm="group"),
            n_epoch=n_epoch, batch_size=16, lr=1e-3, seed=0,
            checkpoint_freq=1, mesh=mesh,
        )

    trainer(2).train(ds, checkpoint_path=path)

    t2 = trainer(4)
    t2.train(ds, checkpoint_path=path)
    hist = t2.outputs["train"]["evolution"]
    assert [h[0] for h in hist] == [1, 2, 3, 4]
    assert np.isfinite(hist[-1][1])
    leaf = jax.tree_util.tree_leaves(t2.state.params)[0]
    assert len(leaf.sharding.device_set) == 8
