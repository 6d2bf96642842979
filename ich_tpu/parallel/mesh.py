"""Device mesh + sharding utilities.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
opt-in in one script (reference ``scripts/inpainting/SNPatchGAN_scripts.py:
116-121``; SURVEY §2.8). The TPU rebuild makes data parallelism first-class
and compiler-driven: one ``jax.sharding.Mesh`` with a ``data`` axis (and an
optional ``model`` axis for conv-channel sharding of the widest layers),
batches sharded over ``data``, parameters replicated, and XLA inserting the
gradient ``psum`` and BatchNorm-statistic collectives over ICI.

Everything degrades gracefully to a single device (mesh of size 1).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DEFAULT_MESH: Optional[Mesh] = None


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the given (default: all) devices.

    1D ``('data',)`` by default; pass ``axis_names=('data', 'model')`` and a
    ``shape`` to carve out a model axis.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def get_mesh(mesh: Optional[Mesh] = None) -> Mesh:
    """Return the given mesh, the process-default one, or build a fresh
    all-device data mesh."""
    global _DEFAULT_MESH
    if mesh is not None:
        return mesh
    if _DEFAULT_MESH is None:
        _DEFAULT_MESH = make_mesh()
    return _DEFAULT_MESH


def set_default_mesh(mesh: Mesh) -> None:
    global _DEFAULT_MESH
    _DEFAULT_MESH = mesh


def batch_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard array axis ``axis`` over the mesh's ``data`` axis, replicate the
    rest."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Optional[Mesh] = None) -> Any:
    """Place a pytree of batched host arrays on the mesh, leading axis split
    over ``data`` (the data-axis size must divide the batch size). Scalar
    (0-d) leaves have no batch axis and are replicated."""
    mesh = get_mesh(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x,
            batch_sharding(mesh, np.ndim(x))
            if np.ndim(x) else replicated_sharding(mesh),
        ),
        batch,
    )


def replicate(tree: Any, mesh: Optional[Mesh] = None) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    mesh = get_mesh(mesh)
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Mesh:
    """Multi-host setup: ``jax.distributed.initialize`` then a global data
    mesh over all hosts' devices (SURVEY §2.8 — the reference has no
    multi-node path at all). Call once at program start on every host; with
    no arguments, coordinates are discovered from the TPU environment."""
    import jax.distributed

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return make_mesh(jax.devices(), axis_names=("data",))
