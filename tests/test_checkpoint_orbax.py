"""Orbax sharded checkpoint backend: round-trip on the virtual 8-device
mesh with real shardings, and the fresh-start/missing-dir contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ich_tpu.train import checkpoint_orbax as cko


def _mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return Mesh(np.array(devs[:8]), ("data",))


def test_missing_dir_returns_none(tmp_path):
    assert cko.load_checkpoint_sharded(str(tmp_path / "nope"), {}) is None


def test_sharded_roundtrip_preserves_values_and_sharding(tmp_path):
    mesh = _mesh()
    sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    state = {
        "params": {"w": jax.device_put(jnp.arange(32.0).reshape(8, 4), sh),
                   "b": jax.device_put(jnp.ones((4,)), repl)},
        "step": jax.device_put(jnp.asarray(7), repl),
    }
    path = str(tmp_path / "ckpt")
    cko.save_checkpoint_sharded(path, state, epoch=3, history=[[1, 0.5]])

    template = jax.tree_util.tree_map(lambda x: x, state)
    restored, epoch, history = cko.load_checkpoint_sharded(path, template)
    assert epoch == 3 and history == [[1, 0.5]]
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(32.0).reshape(8, 4))
    assert restored["params"]["w"].sharding.is_equivalent_to(sh, 2)
    assert int(restored["step"]) == 7


def test_crash_between_finalize_and_swap_restores_new(tmp_path):
    """If the process died after writing state.new but before the swap,
    the loader must restore the complete new checkpoint, not fail."""
    import os
    import shutil

    state = {"w": jnp.full((4,), 2.0)}
    path = str(tmp_path / "ckpt")
    cko.save_checkpoint_sharded(path, state, 1, [[1, 0.9]])
    # simulate the crash window: the finalized save exists only as .new
    os.rename(os.path.join(path, "state"), os.path.join(path, "state.new"))
    restored, epoch, _ = cko.load_checkpoint_sharded(path, state)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.full(4, 2.0))
    assert epoch == 1


def test_same_epoch_rewrite_allowed(tmp_path):
    state = {"w": jnp.zeros((4,))}
    path = str(tmp_path / "ckpt")
    cko.save_checkpoint_sharded(path, state, 1, [])
    cko.save_checkpoint_sharded(path, {"w": jnp.ones((4,))}, 1, [[1, 1.0]])
    restored, epoch, history = cko.load_checkpoint_sharded(path, state)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.ones(4))
    assert history == [[1, 1.0]]


@pytest.mark.slow
def test_orbax_resume_through_unet2d_train(tmp_path):
    """VERDICT r3 item 5: trailing-slash checkpoint_path routes UNet2D.train
    through the orbax sharded store on a real mesh; a mid-training resume
    continues with bit-identical per-epoch losses vs an uninterrupted run
    (reference resume semantics: UNet2D.py:109-121,169-176)."""
    from ich_tpu.data import synthetic_ich_slices
    from ich_tpu.models import UNet
    from ich_tpu.train.segmentation2d import UNet2D

    mesh = _mesh()
    data = synthetic_ich_slices(n_slices=32, size=32, n_volumes=4, seed=3)
    kw = dict(
        n_epoch=4, batch_size=8, lr=5e-3, lr_scheduler="ExponentialLR",
        lr_scheduler_kwargs={"gamma": 0.96}, loss_fn="BinaryDiceLoss",
        loss_fn_kwargs={"reduction": "mean", "p": 2, "alpha": 1.0},
        weight_decay=1e-6, seed=0, mesh=mesh, checkpoint_freq=1,
    )
    net = lambda: UNet(depth=3, top_filter=8, p_dropout=0.0, norm="batch")

    ref = UNet2D(net(), **kw)
    ref.train(data)
    ref_losses = [h[1] for h in ref.outputs["train"]["evolution"]]

    path = str(tmp_path / "ck") + "/"  # trailing slash -> orbax dir store
    t1 = UNet2D(net(), **{**kw, "n_epoch": 2})
    t1.train(data, checkpoint_path=path)
    assert (tmp_path / "ck" / "state").is_dir()  # the sharded store was used
    assert (tmp_path / "ck" / "meta.json").exists()

    t2 = UNet2D(net(), **kw)
    t2.train(data, checkpoint_path=path)
    losses2 = [h[1] for h in t2.outputs["train"]["evolution"]]
    assert len(losses2) == 4
    np.testing.assert_array_equal(np.asarray(losses2), np.asarray(ref_losses))
