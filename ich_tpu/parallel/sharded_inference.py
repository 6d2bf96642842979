"""Spatially-sharded full-volume inference (sequence-parallel analog).

The reference's "long axis" is volume depth (SURVEY §2.8/§5): whole head
CTs can exceed one device's HBM or latency budget. Here the volume's H axis
is sharded over the mesh's ``data`` axis with **halo exchange**: each device
receives the (patch - stride) boundary rows of its neighbors via
``jax.lax.ppermute`` over ICI, runs the coset sliding-window kernel on its
extended slab, and keeps only its own rows — patches straddling a boundary
are computed redundantly by both neighbors instead of communicating
accumulator segments (compute is cheaper than a second round of collectives
at these sizes).

Global-edge devices zero-fill their outer halo, which is exactly the
zero-padding semantics of the single-device path; the patch grid near the
global boundary can differ from the single-device grid by one stride, so
edge voxels may blend a slightly different patch set (weights normalize
either way).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ich_tpu.ops.sliding_window import _sliding_window_coset_jit


def sliding_window_inference_sharded(
    apply_fn: Callable,
    variables,
    volume: jax.Array,
    mesh: Mesh,
    patch_size: Sequence[int] = (64, 64, 64),
    overlap: float = 0.5,
    batch_size: int | None = None,
    axis_name: str = "data",
) -> jax.Array:
    """Shard a (D, H, W[, C]) volume's H axis over ``mesh[axis_name]`` and
    blend patches with halo exchange. Requires stride | patch (the coset
    path). Returns the full (D, H, W, C_out) on the host layout."""
    squeeze_c = volume.ndim == 3
    if squeeze_c:
        volume = volume[..., None]
    d, h, w, c = volume.shape
    patch_size = tuple(int(p) for p in patch_size)
    strides = tuple(max(1, int(p * (1.0 - overlap))) for p in patch_size)
    assert all(p % s == 0 for p, s in zip(patch_size, strides)), (
        "sharded inference requires stride | patch (e.g. overlap 0.5)"
    )
    n_dev = mesh.shape[axis_name]
    pd, ph, pw = patch_size
    sd, sh, sw = strides
    halo = ph - sh
    if batch_size is None:
        batch_size = 128  # the v5e network-call cost quantum (BENCHMARKS.md)

    # pad: D/W to the coset grid, H to a multiple of n_dev*sh with slab >= ph
    def pad_to_grid(dim, p, s):
        return p if dim <= p else p + -(-(dim - p) // s) * s

    d2 = pad_to_grid(d, pd, sd)
    w2 = pad_to_grid(w, pw, sw)
    slab = max(ph, -(-h // (n_dev * sh)) * sh)
    h2 = slab * n_dev
    volume = jnp.pad(volume, [(0, d2 - d), (0, h2 - h), (0, w2 - w), (0, 0)])

    def local(vol_slab, variables):
        idx = jax.lax.axis_index(axis_name)
        # halos from neighbors (ring ppermute; invalid wraps zeroed)
        top = jax.lax.ppermute(
            vol_slab[:, -halo:], axis_name,
            [(i, (i + 1) % n_dev) for i in range(n_dev)],
        )
        bot = jax.lax.ppermute(
            vol_slab[:, :halo], axis_name,
            [(i, (i - 1) % n_dev) for i in range(n_dev)],
        )
        top = jnp.where(idx == 0, 0.0, top)
        bot = jnp.where(idx == n_dev - 1, 0.0, bot)
        ext = jnp.concatenate([top, vol_slab, bot], axis=1)
        # extend to the coset grid along H (halo + slab + halo may need pad)
        ext_h = ext.shape[1]
        ext_h2 = pad_to_grid(ext_h, ph, sh)
        ext = jnp.pad(ext, [(0, 0), (0, ext_h2 - ext_h), (0, 0), (0, 0)])
        out = _sliding_window_coset_jit(
            variables, ext, apply_fn, patch_size, strides, batch_size
        )
        return out[:, halo : halo + slab]

    from jax import shard_map

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis_name, None, None), P()),
        out_specs=P(None, axis_name, None, None),
        check_vma=False,
    )
    vol_sharded = jax.device_put(volume, NamedSharding(mesh, P(None, axis_name, None, None)))
    out = jax.jit(fn)(vol_sharded, variables)
    return out[:d, :h, :w]


def sliding_window_inference_volume_parallel(
    apply_fn: Callable,
    variables,
    volumes: jax.Array,
    mesh: Mesh,
    patch_size: Sequence[int] = (64, 64, 64),
    overlap: float = 0.5,
    batch_size: int | None = None,
    axis_name: str = "data",
) -> jax.Array:
    """Volume-parallel serving scale-out: a (N, D, H, W[, C]) stack of
    same-shaped CTs sharded one-volume-per-device over ``mesh[axis_name]``.

    Each device runs the *unmodified* single-volume program
    (:func:`ich_tpu.ops.sliding_window.sliding_window_inference`) on its
    local volumes — zero collectives, linear scaling over ICI-attached
    chips (the serving counterpart of batch-sharded training; the
    reference's torch pipeline segments volumes strictly serially,
    ``UNet2D.py:272-314``). N is padded up to a multiple of the axis size
    by repeating the last volume; padded outputs are dropped. With more
    than one volume per device the local stack runs through ``lax.map``,
    compiling the sliding-window program once.

    Returns (N, D, H, W, C_out) float32.
    """
    from ich_tpu.ops.sliding_window import sliding_window_inference

    if volumes.ndim == 4:
        volumes = volumes[..., None]
    n, d, h, w, c = volumes.shape
    n_dev = mesh.shape[axis_name]
    n_pad = -(-n // n_dev) * n_dev
    if n_pad != n:
        volumes = jnp.concatenate(
            [volumes, jnp.repeat(volumes[-1:], n_pad - n, axis=0)]
        )

    def local(vols_blk, variables):
        single = lambda v: sliding_window_inference(
            apply_fn, variables, v,
            patch_size=patch_size, overlap=overlap, batch_size=batch_size,
        )
        if vols_blk.shape[0] == 1:
            return single(vols_blk[0])[None]
        return jax.lax.map(single, vols_blk)

    from jax import shard_map

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(axis_name),
        check_vma=False,
    )
    vols_sharded = jax.device_put(volumes, NamedSharding(mesh, P(axis_name)))
    out = jax.jit(fn)(vols_sharded, variables)
    return out[:n]
