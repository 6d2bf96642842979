"""Pallas TPU kernel for the separable EDT min-plus pass.

The exact euclidean distance transform (:mod:`ich_tpu.ops.distance`)
reduces to two passes of ``out[r, x] = min_j (g[r, j] + (x - j)^2)`` — a
matmul in the (min, +) semiring. The jnp formulation materializes an
(rows, N, N) broadcast per image in HBM; this kernel tiles rows into VMEM
and keeps the whole (TILE, N, N) working set on chip, so HBM traffic drops
to the (rows, N) inputs/outputs. Used by the DiscountedL1 inpainting loss,
which runs the EDT every GAN training step
(reference ``LossFunctions.py:343-409``).

Falls back to interpreter mode off-TPU (the CPU test mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 16  # rows per grid step


def _minplus_kernel(g_ref, d2_ref, out_ref):
    # g: (TILE, N) site costs; d2: (N, N) pairwise (x-j)^2; out: (TILE, N)
    g = g_ref[:]  # (T, N)
    d2 = d2_ref[:]  # (N, N)
    # out[t, x] = min_j g[t, j] + d2[x, j]
    out_ref[:] = jnp.min(g[:, None, :] + d2[None, :, :], axis=-1)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.jit, static_argnames=("interpret",))
def edt_pass_1d(g: jax.Array, interpret: bool = False) -> jax.Array:
    """One separable squared-EDT pass along the last axis.

    g: (R, N) float32 site costs (0 at sites, big elsewhere).
    Returns (R, N): ``min_j g[r, j] + (x - j)^2``.
    """
    r, n = g.shape
    pad_r = (-r) % _TILE
    if pad_r:
        g = jnp.pad(g, ((0, pad_r), (0, 0)), constant_values=0.0)
    x = jnp.arange(n, dtype=jnp.float32)
    d2 = (x[:, None] - x[None, :]) ** 2

    out = pl.pallas_call(
        _minplus_kernel,
        grid=((r + pad_r) // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((r + pad_r), n), jnp.float32),
        interpret=interpret,
    )(g, d2)
    return out[:r]


def distance_transform_edt_pallas(mask: jax.Array, interpret: bool | None = None) -> jax.Array:
    """Drop-in for :func:`ich_tpu.ops.distance.distance_transform_edt`
    (distance to the nearest ``mask == 0`` pixel) using the Pallas min-plus
    kernel for both passes."""
    if interpret is None:
        interpret = not _on_tpu()
    inf = 1e10
    m = mask.astype(jnp.float32)
    g = jnp.where(m > 0, inf, 0.0)
    lead = g.shape[:-2]
    h, w = g.shape[-2:]
    b = 1
    for s in lead:
        b *= int(s)
    flat = g.reshape(b, h, w)

    # pass along W: all (B*H) rows in one kernel launch — the VMEM tiling
    # keeps the (TILE, W, W) working set on chip regardless of batch size
    d2 = edt_pass_1d(flat.reshape(b * h, w), interpret=interpret).reshape(b, h, w)
    # pass along H: transpose within each image, again one launch
    d2 = jnp.swapaxes(d2, 1, 2).reshape(b * w, h)
    d2 = edt_pass_1d(d2, interpret=interpret).reshape(b, w, h)
    out = jnp.swapaxes(d2, 1, 2).reshape(lead + (h, w))
    return jnp.sqrt(jnp.minimum(out, inf))
