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
