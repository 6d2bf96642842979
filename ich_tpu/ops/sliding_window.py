"""Gaussian-blended sliding-window volumetric inference — one jitted scan.

The BASELINE north star: a whole head CT segmented on device with no host
round-trips. The reference's intended 3D path is broken
(``UNet3D_trainer.py``, SURVEY §2.5) and its working 2.5D inference loops
batches through the host (``UNet2D.py:293-302``); here the full pipeline —
patch extraction over a precomputed coordinate grid, network forward,
Gaussian-weighted accumulation, normalization — is a single XLA program:

- patch grid: static coords from (volume shape, patch size, overlap), the
  standard ``last = dim - patch`` clamped-stride tiling;
- extraction: ``lax.dynamic_slice`` per patch, batched with vmap;
- blending: a separable Gaussian importance map (σ = patch/8), accumulated
  with read-modify-write ``dynamic_update_slice`` inside ``lax.scan`` so
  overlapping writes are correctly serialized;
- everything static-shaped: volumes are padded up to the grid, outputs
  cropped back.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ich_tpu.ops import fastconv


def _gaussian_importance_np(
    patch_size: Sequence[int], sigma_scale: float = 1.0 / 8.0
) -> np.ndarray:
    ws = []
    for n in patch_size:
        c = (n - 1) / 2.0
        sig = max(n * sigma_scale, 1e-3)
        x = np.arange(n, dtype=np.float64)
        w = np.exp(-0.5 * ((x - c) / sig) ** 2)
        ws.append(w)
    m = ws[0][:, None, None] * ws[1][None, :, None] * ws[2][None, None, :]
    m = m / m.max()
    # floor far-corner weights: keeps the normalization well-conditioned in
    # f32 (a 3-axis gaussian corner underflows to ~1e-10 otherwise)
    return np.maximum(m, 1e-2)


def gaussian_importance_map(
    patch_size: Sequence[int], sigma_scale: float = 1.0 / 8.0, dtype=jnp.float32
) -> jax.Array:
    """Separable Gaussian weight map peaking at the patch center (the
    standard nnU-Net-style blending kernel). Never exactly zero so the
    normalization is safe everywhere."""
    return jnp.asarray(_gaussian_importance_np(patch_size, sigma_scale), dtype=dtype)


def patch_grid(dim: int, patch: int, step: int) -> np.ndarray:
    """Start coordinates tiling [0, dim) with stride ``step``, last patch
    clamped to ``dim - patch`` (full coverage, static count)."""
    if dim <= patch:
        return np.asarray([0])
    starts = list(range(0, dim - patch + 1, step))
    if starts[-1] != dim - patch:
        starts.append(dim - patch)
    return np.asarray(starts)


def make_patch_coords(
    vol_shape: Sequence[int], patch_size: Sequence[int], overlap: float = 0.5
) -> np.ndarray:
    """(N, 3) int32 start coordinates covering the volume."""
    steps = [max(1, int(p * (1.0 - overlap))) for p in patch_size]
    axes = [patch_grid(d, p, s) for d, p, s in zip(vol_shape, patch_size, steps)]
    g = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    return g.astype(np.int32)


@partial(
    jax.jit,
    static_argnames=(
        "apply_fn", "patch_size", "batch_size", "n_coords_static", "packing"),
)
def _sliding_window_jit(
    variables,
    volume,  # (D, H, W, C) padded so every patch fits
    coords,  # (Np, 3) padded to a multiple of batch_size (dup coords ok)
    keep,  # (Np,) 1.0 for real patches, 0.0 for padding duplicates
    apply_fn: Callable,
    patch_size: Tuple[int, int, int],
    batch_size: int,
    n_coords_static: int,
    # cache-key only (fastconv mode is read at trace time); REQUIRED so a
    # forgotten call site is a TypeError, not a silent stale-program hit
    packing: str,
):
    pd, ph, pw = patch_size
    gmap = gaussian_importance_map(patch_size)[..., None]  # (pd,ph,pw,1)

    def extract(c):
        return jax.lax.dynamic_slice(
            volume, (c[0], c[1], c[2], 0), (pd, ph, pw, volume.shape[3])
        )

    n_batches = n_coords_static // batch_size
    coords_b = coords[: n_batches * batch_size].reshape(n_batches, batch_size, 3)

    # probe output channel count statically
    c_out = jax.eval_shape(
        apply_fn, variables, jnp.zeros((1, pd, ph, pw, volume.shape[3]), volume.dtype)
    ).shape[-1]
    acc = jnp.zeros(volume.shape[:3] + (c_out,), dtype=jnp.float32)
    wacc = jnp.zeros(volume.shape[:3] + (1,), dtype=jnp.float32)

    keep = keep[: n_batches * batch_size].reshape(n_batches, batch_size)

    def body(carry, inp):
        acc, wacc = carry
        cs, kp = inp  # (B, 3), (B,)
        patches = jax.vmap(extract)(cs)  # (B, pd, ph, pw, C)
        preds = apply_fn(variables, patches).astype(jnp.float32)  # (B,...,c_out)
        wpred = preds * gmap[None] * kp[:, None, None, None, None]
        wmap = jnp.broadcast_to(gmap[None], (batch_size, pd, ph, pw, 1)) * kp[
            :, None, None, None, None
        ]

        def write(i, st):
            a, wa = st
            c = cs[i]
            blk = jax.lax.dynamic_slice(a, (c[0], c[1], c[2], 0), (pd, ph, pw, c_out))
            a = jax.lax.dynamic_update_slice(a, blk + wpred[i], (c[0], c[1], c[2], 0))
            wblk = jax.lax.dynamic_slice(wa, (c[0], c[1], c[2], 0), (pd, ph, pw, 1))
            wa = jax.lax.dynamic_update_slice(wa, wblk + wmap[i], (c[0], c[1], c[2], 0))
            return a, wa

        acc, wacc = jax.lax.fori_loop(0, batch_size, write, (acc, wacc))
        return (acc, wacc), None

    (acc, wacc), _ = jax.lax.scan(body, (acc, wacc), (coords_b, keep))
    return acc / jnp.maximum(wacc, 1e-12)


@lru_cache(maxsize=2)  # entries are full-volume f32 canvases (~67 MB each);
# the jit cache already holds one trace per shape, so hits beyond the
# current shape are rare — keep at most the active shape + one
def _coset_weight_canvas(
    dims: Tuple[int, int, int],
    patch_size: Tuple[int, int, int],
    stride: Tuple[int, int, int],
) -> np.ndarray:
    """Reciprocal of the summed Gaussian weight canvas for a regular coset
    grid — data-independent, so computed once on the host at trace time
    (the in-graph accumulation would cost a serialized read-modify-write
    chain over the full volume per coset)."""
    gmap = _gaussian_importance_np(patch_size).astype(np.float32)[..., None]
    pd, ph, pw = patch_size
    kd, kh, kw = (p // s for p, s in zip(patch_size, stride))
    n = [(dims[i] - patch_size[i]) // stride[i] + 1 for i in range(3)]
    wacc = np.zeros(tuple(dims) + (1,), np.float64)
    for cd in range(min(kd, n[0])):
        for ch_ in range(min(kh, n[1])):
            for cw in range(min(kw, n[2])):
                md = (n[0] - 1 - cd) // kd + 1 if cd < n[0] else 0
                mh = (n[1] - 1 - ch_) // kh + 1 if ch_ < n[1] else 0
                mw = (n[2] - 1 - cw) // kw + 1 if cw < n[2] else 0
                if md == 0 or mh == 0 or mw == 0:
                    continue
                od, oh, ow = cd * stride[0], ch_ * stride[1], cw * stride[2]
                tile = np.tile(
                    gmap.reshape(1, pd, 1, ph, 1, pw, 1), (md, 1, mh, 1, mw, 1, 1)
                ).reshape(md * pd, mh * ph, mw * pw, 1)
                wacc[od : od + md * pd, oh : oh + mh * ph, ow : ow + mw * pw] += tile
    return (1.0 / np.maximum(wacc, 1e-12)).astype(np.float32)


@partial(jax.jit, static_argnames=(
    "apply_fn", "patch_size", "stride", "batch_size", "packing"))
def _sliding_window_coset_jit(
    variables,
    volume,  # (D', H', W', C) padded so (dim - patch) % stride == 0
    apply_fn: Callable,
    patch_size: Tuple[int, int, int],
    stride: Tuple[int, int, int],
    batch_size: int,
    # cache-key only (fastconv mode is read at trace time); REQUIRED so a
    # forgotten call site is a TypeError, not a silent stale-program hit
    packing: str,
):
    """Regular-grid fast path: when the stride divides the patch size, the
    patch grid decomposes into k^3 *cosets* of mutually non-overlapping
    patches (k = patch/stride). Within a coset, both patch extraction and
    blended accumulation are pure reshapes — no gathers, no serialized
    dynamic-update-slice read-modify-write. Only the network forward and
    the Gaussian multiply remain, so XLA keeps the MXU busy.
    """
    pd, ph, pw = patch_size
    sd, sh, sw = stride
    kd, kh, kw = pd // sd, ph // sh, pw // sw
    dims = volume.shape[:3]
    c = volume.shape[3]
    n = [(dims[i] - patch_size[i]) // stride[i] + 1 for i in range(3)]
    gmap = gaussian_importance_map(patch_size)[..., None]

    c_out = jax.eval_shape(
        apply_fn, variables, jnp.zeros((1, pd, ph, pw, c), volume.dtype)
    ).shape[-1]

    def coset_counts(ci, axis):
        # patches of coset ci along an axis: indices ci, ci+k, ci+2k, ...
        return (n[axis] - 1 - ci) // (kd, kh, kw)[axis] + 1 if ci < n[axis] else 0

    # Pass 1: extract every coset's patch stack. Within a coset both the
    # extraction and (later) the blended scatter-back are pure reshapes.
    cosets = []  # (origin, (md, mh, mw), start index into the global stack)
    stacks = []
    total = 0
    for cd in range(min(kd, n[0])):
        for ch_ in range(min(kh, n[1])):
            for cw in range(min(kw, n[2])):
                md = coset_counts(cd, 0)
                mh = coset_counts(ch_, 1)
                mw = coset_counts(cw, 2)
                if md == 0 or mh == 0 or mw == 0:
                    continue
                od, oh, ow = cd * sd, ch_ * sh, cw * sw
                view = jax.lax.slice(
                    volume,
                    (od, oh, ow, 0),
                    (od + md * pd, oh + mh * ph, ow + mw * pw, c),
                )
                patches = view.reshape(md, pd, mh, ph, mw, pw, c)
                patches = patches.transpose(0, 2, 4, 1, 3, 5, 6).reshape(
                    md * mh * mw, pd, ph, pw, c
                )
                cosets.append(((od, oh, ow), (md, mh, mw), total))
                stacks.append(patches)
                total += patches.shape[0]
    stack = stacks[0] if len(stacks) == 1 else jnp.concatenate(stacks)

    # Pass 2: the network over the GLOBAL patch stack in batch_size chunks
    # (exact-shape tail, no zero-padding waste). Batching across cosets
    # matters: chunk shapes below ~the saturating batch cost nearly as much
    # as full ones (measured round 3: b=56 runs 51.4 ms where b=64 runs
    # 52.9 and b=128 runs 52.2 — see docs/BENCHMARKS.md), so four per-coset
    # ragged chunks (64+56+56+49) waste ~2x vs two global ones (128+97).
    #
    # The barriers serialize the chunk calls. They are NOT optional: the
    # chunks are data-independent, and an unbarriered program lets XLA
    # interleave every network body, multiplying peak activation liveness
    # past HBM (measured: 28.7G requested at 128^3; the 64^3 batch-64
    # compile alone runs >25 min from the liveness explosion).
    preds_chunks = []
    for i in range(0, total, batch_size):
        pi = stack[i : i + batch_size]
        if preds_chunks:
            pi, _ = jax.lax.optimization_barrier(
                (pi, preds_chunks[-1][0, 0, 0, 0, 0])
            )
        preds_chunks.append(apply_fn(variables, pi).astype(jnp.float32))
    preds = preds_chunks[0] if len(preds_chunks) == 1 else jnp.concatenate(preds_chunks)
    preds = preds * gmap[None]

    # Pass 3: per-coset blended accumulation (reshape + one slice-add)
    acc = jnp.zeros(dims + (c_out,), jnp.float32)
    for (od, oh, ow), (md, mh, mw), start in cosets:
        block = jax.lax.slice_in_dim(preds, start, start + md * mh * mw, axis=0)
        block = block.reshape(md, mh, mw, pd, ph, pw, c_out)
        block = block.transpose(0, 3, 1, 4, 2, 5, 6).reshape(
            md * pd, mh * ph, mw * pw, c_out
        )
        acc = jax.lax.dynamic_update_slice(
            acc,
            jax.lax.dynamic_slice(acc, (od, oh, ow, 0), block.shape) + block,
            (od, oh, ow, 0),
        )
    inv_w = jnp.asarray(_coset_weight_canvas(dims, patch_size, stride))
    return acc * inv_w


def sliding_window_inference(
    apply_fn: Callable,
    variables,
    volume: jax.Array,
    patch_size: Sequence[int] = (128, 128, 128),
    overlap: float = 0.5,
    batch_size: int | None = None,
    compute_dtype=None,
) -> jax.Array:
    """Segment a (D, H, W[, C]) volume with Gaussian-blended overlapping
    patches. ``apply_fn(variables, batch)`` maps (B, pd, ph, pw, C) →
    (B, pd, ph, pw, C_out) probabilities. Returns (D, H, W, C_out) float32.

    ``batch_size=None`` resolves to 128 for coset-eligible patch sizes
    (network-call cost on v5e is quantized in ~128-patch units — b=32..128
    cost the same, so big chunks are ~2× over small ones for free; measured
    round 3, docs/BENCHMARKS.md) and 4 on the big-patch scan path (HBM).

    When the stride ``patch*(1-overlap)`` divides the patch size (e.g. the
    standard 0.5 overlap), dispatches to the coset-reshape fast path
    (:func:`_sliding_window_coset_jit`); otherwise the general
    scan-and-scatter path runs.

    ``compute_dtype=jnp.bfloat16`` casts the volume before patch
    extraction: a bf16-compute network casts its inputs anyway, so this
    halves the extraction/reshape HBM traffic at no extra precision loss
    (blending stays float32).
    """
    squeeze_c = volume.ndim == 3
    if squeeze_c:
        volume = volume[..., None]
    if compute_dtype is not None:
        volume = volume.astype(compute_dtype)
    d, h, w, c = volume.shape
    patch_size = tuple(int(p) for p in patch_size)

    strides = tuple(max(1, int(p * (1.0 - overlap))) for p in patch_size)
    # The coset path inlines one network body per (coset, chunk) — fastest
    # for small patches, but at big ones (128^3: each inlined body is a
    # full-volume-scale U-Net) the XLA program size/liveness explodes and
    # the compile itself runs for minutes before failing. Big patches go
    # through the scan path, which compiles the network exactly once.
    coset_ok = int(np.prod(patch_size)) <= 2 ** 20  # <= 101^3 voxels
    use_coset = coset_ok and all(p % s == 0 for p, s in zip(patch_size, strides))
    if batch_size is None:
        # 128 only where the coset path's exact-shape chunks make big
        # batches free; the scan path pads the patch count to a batch
        # multiple, so a big default there executes dead patches
        batch_size = 128 if use_coset else 4
    if use_coset:
        # pad so every axis satisfies (dim - patch) % stride == 0 and dim >= patch
        dims = (d, h, w)
        pads = []
        for dim, p, s in zip(dims, patch_size, strides):
            target = p if dim <= p else p + -(-(dim - p) // s) * s
            pads.append(target - dim)
        if any(pads):
            volume = jnp.pad(volume, [(0, pads[0]), (0, pads[1]), (0, pads[2]), (0, 0)])
        out = _sliding_window_coset_jit(
            variables, volume, apply_fn, patch_size, strides, batch_size,
            packing=fastconv.packing_key(),
        )
        return out[:d, :h, :w]
    # pad volume up to patch size
    pad = [max(0, p - s) for p, s in zip(patch_size, (d, h, w))]
    if any(pad):
        volume = jnp.pad(
            volume, [(0, pad[0]), (0, pad[1]), (0, pad[2]), (0, 0)]
        )
    vshape = volume.shape[:3]
    coords = make_patch_coords(vshape, patch_size, overlap)
    n = len(coords)
    n_pad = int(np.ceil(n / batch_size) * batch_size)
    keep = np.ones(n_pad, dtype=np.float32)
    if n_pad != n:
        coords = np.concatenate([coords, np.repeat(coords[-1:], n_pad - n, axis=0)])
        keep[n:] = 0.0
    out = _sliding_window_jit(
        variables,
        volume,
        jnp.asarray(coords),
        jnp.asarray(keep),
        apply_fn,
        patch_size,
        batch_size,
        n_pad,
        packing=fastconv.packing_key(),
    )
    out = out[:d, :h, :w]
    return out
