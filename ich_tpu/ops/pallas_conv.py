"""Pallas implicit-GEMM 3D conv for the lane-bound C_out=16 levels.

Every XLA-level lane-fill transformation for the top U-Net levels is a
measured negative (depth-to-space / block-space round 2, grouped convs
round 3 — docs/BENCHMARKS.md): the pack/unpack always lands as separate
HBM passes that break conv fusion. This kernel is the remaining avenue the
round-2 verdict pointed at: fuse the packing into the conv itself.

Formulation — one output plane (fixed batch b, depth d) per grid step:

    rows   M = (h, w0)            H x W/8 output-tile rows
    cols   K = (kd, kh, wa, ci)   3*3*10*Cin input-window taps
    lanes  N = (dw, co)           8 w-offsets x 16 out-channels = 128

``A[(h,w0), (kd,kh,wa,ci)] = x[b, d+kd-1, h+kh-1, 8*w0+wa-1, ci]`` is an
im2col built in VMEM from three overlapping depth planes (reshape/concat
only — the w-window trick: pad w by (1 left, 7 right), reshape to 8-blocks,
a 10-wide window is block j + the first 2 columns of block j+1). The
packed weights ``W2[K, (dw,co)] = W[kd, kh, wa-dw, ci, co]`` (zero unless
``wa-dw`` in {0,1,2}) are 30% dense — the MXU runs 3.33x the useful MACs,
but at the full 128-lane rate instead of C_out=16/128, a ~1.9x ceiling
over XLA's direct conv at these shapes (measured 29.9 TF/s, round 2).

Opt-in via ``fastconv.set_packing("pallas")``; inference-only (no custom
VJP — training paths keep the direct conv). Off-TPU the kernel runs in
interpret mode (tests); the TPU perf gate lives in docs/BENCHMARKS.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WTILE = 8          # output w positions packed into lanes
COUT = 16          # lane budget: 8 * 16 = 128
WA = WTILE + 2     # input-w window per tile (3-tap kernel)


def qualifies(x_shape, w_shape, itemsize: int = 2) -> bool:
    """3D SAME stride-1 3x3x3 conv, C_out=16, W a multiple of 8, plane
    small enough for VMEM (A-matrix + slabs <= ~8 MB). ``itemsize`` is the
    activation dtype's byte width (the kernel computes in x's dtype, so a
    float32 activation doubles the footprint vs the bf16 default)."""
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    b, d, h, w, ci = x_shape
    if w_shape[:3] != (3, 3, 3) or w_shape[3] != ci or w_shape[4] != COUT:
        return False
    if w % WTILE or w < 2 * WTILE or h < 4:
        return False
    k = 9 * WA * ci
    a_bytes = (h * (w // WTILE)) * _round_up(k, 128) * itemsize
    return ci in (1, 8, 16, 32) and a_bytes <= 8 * 2 ** 20


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_weights(w: jax.Array) -> jax.Array:
    """(3, 3, 3, Ci, 16) -> (Kpad, 128) with rows (kd, kh, wa, ci)."""
    ci = w.shape[3]
    k = 9 * WA * ci
    w2 = jnp.zeros((3, 3, WA, ci, WTILE, COUT), w.dtype)
    for dw in range(WTILE):
        for kw in range(3):
            w2 = w2.at[:, :, dw + kw, :, dw, :].set(w[:, :, kw])
    w2 = w2.reshape(k, WTILE * COUT)
    kpad = _round_up(k, 128)
    if kpad != k:
        w2 = jnp.pad(w2, ((0, kpad - k), (0, 0)))
    return w2


def _kernel(x0, x1, x2, w2, out, *, h, w, ci):
    nt = w // WTILE
    blocks = []
    for ref in (x0, x1, x2):
        plane = ref[0, 0]                   # (h+2, w+8, ci)
        for kh in range(3):
            y = plane[kh:kh + h]            # (h, w+8, ci)
            t = y.reshape(h, nt + 1, WTILE, ci)
            a = jnp.concatenate([t[:, :nt], t[:, 1:nt + 1, :2]], axis=2)
            blocks.append(a)                # (h, nt, 10, ci)
    k = 9 * WA * ci
    A = jnp.stack(blocks, axis=2).reshape(h * nt, k)
    kpad = w2.shape[0]
    if kpad != k:
        A = jnp.pad(A, ((0, 0), (0, kpad - k)))
    o = jnp.dot(A, w2[:], preferred_element_type=jnp.float32)
    out[0, 0] = o.reshape(h, nt, WTILE, COUT).reshape(h, w, COUT).astype(out.dtype)


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        return True


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv3d_16(x, w2, interpret: bool):
    b, d, h, w, ci = x.shape
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (1, WA - 3), (0, 0)])
    kern = functools.partial(_kernel, h=h, w=w, ci=ci)
    specs = [
        pl.BlockSpec((1, 1, h + 2, w + WA - 2, ci),
                     (lambda bi, di, kd=kd: (bi, di + kd, 0, 0, 0)),
                     memory_space=pltpu.VMEM)
        for kd in range(3)
    ]
    return pl.pallas_call(
        kern,
        grid=(b, d),
        in_specs=specs + [pl.BlockSpec(w2.shape, lambda bi, di: (0, 0),
                                       memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, h, w, COUT),
                               lambda bi, di: (bi, di, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, COUT), x.dtype),
        interpret=interpret,
    )(xp, xp, xp, w2)


def conv3d_same16(x: jax.Array, w: jax.Array) -> jax.Array:
    """SAME stride-1 3x3x3 conv with C_out=16 on the implicit-GEMM kernel.
    x: (B, D, H, W, Ci); w: (3, 3, 3, Ci, 16). Output dtype follows x
    (accumulation is f32 inside the matmul)."""
    w2 = pack_weights(w.astype(x.dtype))
    return _conv3d_16(x, w2, _interpret())
