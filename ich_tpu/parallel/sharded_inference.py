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

from ich_tpu.ops import fastconv
from ich_tpu.ops.sliding_window import _sliding_window_coset_jit

# compiled volume-parallel programs, keyed by (mesh, axis, round shape,
# dtype, caller key); the stored body reference guards against a caller
# reusing a key with a different body closure
_VP_CACHE: dict = {}


def volume_parallel_map(
    body: Callable,
    variables,
    volumes: Sequence[np.ndarray],
    mesh: Mesh,
    axis_name: str = "data",
    cache_key=None,
    guard=None,
    pipeline_depth: int = 2,
):
    """Map ``body(variables, vol) -> out_vol`` over same-shaped volumes,
    one volume per device per round over ``mesh[axis_name]``.

    The shared engine of every volume-parallel serving path (2.5D slice
    stacks, 3D sliding windows): rounds of exactly ``n_dev`` volumes bound
    device memory to one input + one output per chip regardless of the
    request size, at most ``pipeline_depth`` rounds are in flight
    (executions are in-order, so fetching the oldest round frees its
    buffers), and the compiled shard_map program is memoized per
    (mesh, shape, cache_key) so a long-running server pays one trace.

    Yields one host ``np.ndarray`` per input volume, in order.
    """
    from ich_tpu.utils.pipeline import fetch_pipelined

    n = len(volumes)
    if n == 0:
        return
    n_dev = mesh.shape[axis_name]
    shape = tuple(volumes[0].shape)
    dtype = np.asarray(volumes[0]).dtype

    # a cache hit requires BOTH the hashable key and identity of the
    # caller's stable closure object (``guard``, default the body itself):
    # a fresh closure per call simply misses and re-traces — never a stale
    # program for different logic
    guard = body if guard is None else guard
    key = (mesh, axis_name, shape, str(dtype), cache_key)
    hit = _VP_CACHE.get(key)
    if hit is not None and hit[0] is guard:
        fn = hit[1]
    else:
        def local(variables, blk):  # blk: (1, ...) local volume
            return body(variables, blk[0])[None]

        fn = jax.jit(shard_map_fn(local, mesh, axis_name))
        _VP_CACHE[key] = (guard, fn)

    def rounds():
        for i in range(0, n, n_dev):
            chunk = [np.asarray(v) for v in volumes[i:i + n_dev]]
            k = len(chunk)
            if k < n_dev:  # pad the tail round by repeating the last volume
                chunk = chunk + [chunk[-1]] * (n_dev - k)
            # device_put the HOST stack with the sharding attached: each
            # device receives only its shard. Staging through jnp.asarray
            # first would materialize the whole round on the default device
            # (an n_dev-times HBM spike + an extra device-to-device pass).
            stack = jax.device_put(
                np.stack(chunk), NamedSharding(mesh, P(axis_name))
            )
            yield k, fn(variables, stack)

    for k, out in fetch_pipelined(rounds(), depth=pipeline_depth,
                                  fetch=lambda t: (t[0], np.asarray(t[1]))):
        for j in range(k):
            yield out[j]


def shard_map_fn(local: Callable, mesh: Mesh, axis_name: str):
    """shard_map wrapper used by the volume-parallel paths: variables
    replicated, leading axis sharded one-per-device."""
    from jax import shard_map

    return shard_map(
        local, mesh=mesh, in_specs=(P(), P(axis_name)),
        out_specs=P(axis_name), check_vma=False,
    )


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
        if halo:  # overlap 0 -> no boundary-straddling patches, no exchange
            # halos from neighbors (ring ppermute; invalid wraps zeroed).
            # NB halo == 0 must NOT take this path: vol_slab[:, -0:] is the
            # WHOLE slab, which would ship and prepend the neighbor's slab.
            idx = jax.lax.axis_index(axis_name)
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
        else:
            ext = vol_slab
        # extend to the coset grid along H (halo + slab + halo may need pad)
        ext_h = ext.shape[1]
        ext_h2 = pad_to_grid(ext_h, ph, sh)
        ext = jnp.pad(ext, [(0, 0), (0, ext_h2 - ext_h), (0, 0), (0, 0)])
        out = _sliding_window_coset_jit(
            variables, ext, apply_fn, patch_size, strides, batch_size,
            packing=fastconv.packing_key(),
        )
        return out[:, halo : halo + slab]

    from jax import shard_map

    # memoize the jitted shard_map program: a fresh closure per call would
    # re-trace every invocation (the serving path calls this per request);
    # keyed by the fastconv packing mode (read at trace time) too
    key = (mesh, axis_name, (d2, h2, w2, c), str(volume.dtype),
           patch_size, strides, batch_size, fastconv.packing_key())
    hit = _VP_CACHE.get(key)
    if hit is not None and hit[0] is apply_fn:
        fn = hit[1]
    else:
        fn = jax.jit(shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, axis_name, None, None), P()),
            out_specs=P(None, axis_name, None, None),
            check_vma=False,
        ))
        _VP_CACHE[key] = (apply_fn, fn)
    vol_sharded = jax.device_put(volume, NamedSharding(mesh, P(None, axis_name, None, None)))
    out = fn(vol_sharded, variables)
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
    local volume — zero collectives, linear scaling over ICI-attached
    chips (the serving counterpart of batch-sharded training; the
    reference's torch pipeline segments volumes strictly serially,
    ``UNet2D.py:272-314``). Runs through :func:`volume_parallel_map`:
    rounds of ``n_dev`` volumes (device memory stays bounded at one
    input + output per chip however large the request), pipelined
    fetches, and a memoized compiled program across calls.

    Returns (N, D, H, W, C_out) float32 (host).
    """
    from ich_tpu.ops.sliding_window import sliding_window_inference

    if hasattr(volumes, "ndim") and volumes.ndim == 4:
        volumes = volumes[..., None]

    def body(variables, v):
        return sliding_window_inference(
            apply_fn, variables, v,
            patch_size=patch_size, overlap=overlap, batch_size=batch_size,
        )

    vol_list = [np.asarray(v) for v in volumes]
    outs = list(volume_parallel_map(
        body, variables, vol_list, mesh, axis_name=axis_name,
        cache_key=("sw_vp", tuple(patch_size), overlap, batch_size,
                   fastconv.packing_key()),
        guard=apply_fn,
    ))
    return np.stack(outs)
