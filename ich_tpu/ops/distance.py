"""Euclidean distance transform on device.

The reference's DiscountedL1 loss computes, per sample, the euclidean
distance of every masked pixel to the nearest mask-border pixel with a
Python loop over the batch and a quadratic ``torch.cdist`` against the
border point set (reference
``code/src/models/optim/LossFunctions.py:387-409``). That shape is
data-dependent and host-bound; here we compute an **exact** squared
euclidean distance transform with the separable two-pass formulation
(per-axis ``min_j (g[j] + (x-j)^2)``), evaluated as a dense broadcasted min
— O(n) memory per line, fully static shapes, batched, jit-friendly. For
256^2 images the whole transform is a few tens of MFLOPs on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = 1e10


def _edt_1d_sq(g: jax.Array) -> jax.Array:
    """One separable pass: for each position x along the last axis,
    ``min_j (g[..., j] + (x - j)^2)``. Dense O(n^2) min over a broadcast —
    exact, vectorized, static shapes."""
    n = g.shape[-1]
    x = jnp.arange(n, dtype=jnp.float32)
    # (n, n) squared distances between output position x and input position j
    d2 = (x[:, None] - x[None, :]) ** 2
    # out[..., x] = min_j g[..., j] + d2[x, j]
    return jnp.min(g[..., None, :] + d2, axis=-1)


def _edt_2d_sq(g: jax.Array) -> jax.Array:
    """Two separable passes over one (H, W) image of site costs."""
    d2 = _edt_1d_sq(g)
    return jnp.swapaxes(_edt_1d_sq(jnp.swapaxes(d2, -1, -2)), -1, -2)


def distance_transform_edt(mask: jax.Array) -> jax.Array:
    """Exact euclidean distance from each pixel to the nearest pixel where
    ``mask == 0`` (the convention of ``scipy.ndimage.distance_transform_edt``).

    mask: (..., H, W) binary. Returns float32 distances, same shape.
    Pixels where mask == 0 get distance 0. If a sample's mask has no zero
    pixel anywhere, its distances saturate at sqrt(_INF).

    On TPU the min-plus passes run as a Pallas kernel with the working set
    tiled in VMEM (:mod:`ich_tpu.ops.pallas_edt`; ~2x faster than the dense
    XLA broadcast at 512^2 and memory-bounded). Elsewhere, leading axes are
    processed sequentially (``lax.map``) to bound the O(H*W*max(H,W))
    intermediate to one image at a time (~67 MB at 256^2).
    """
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        on_tpu = False
    if on_tpu:
        from ich_tpu.ops.pallas_edt import distance_transform_edt_pallas

        return distance_transform_edt_pallas(mask, interpret=False)
    m = mask.astype(jnp.float32)
    g = jnp.where(m > 0, _INF, 0.0)  # 0 at sites, inf elsewhere
    if g.ndim == 2:
        d2 = _edt_2d_sq(g)
    else:
        lead = g.shape[:-2]
        flat = g.reshape((-1,) + g.shape[-2:])
        d2 = jax.lax.map(_edt_2d_sq, flat).reshape(lead + g.shape[-2:])
    return jnp.sqrt(jnp.minimum(d2, _INF))


def distance_to_set(site: jax.Array) -> jax.Array:
    """Euclidean distance from every pixel to the nearest pixel where
    ``site == 1``. (EDT of the complement.)"""
    return distance_transform_edt(1.0 - site.astype(jnp.float32))
