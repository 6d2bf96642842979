"""Binary morphology + hysteresis thresholding as device ops.

The reference's inpainting anomaly detector uses skimage morphology
(hysteresis thresholds at q75 + α·IQR, opening/closing, ``
InpaintAnomalyDetector.py:156-160,176-227``) on the host. Here: dilation /
erosion are max/min pools, opening/closing compose them, and hysteresis is
seed propagation (iterated masked dilation) inside ``lax.while_loop``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pool(x: jax.Array, op, size: int = 3) -> jax.Array:
    """Sliding window reduce over the last two axes (any leading dims)."""
    nd = x.ndim
    window = (1,) * (nd - 2) + (size, size)
    strides = (1,) * nd
    init = -jnp.inf if op is jax.lax.max else jnp.inf
    return jax.lax.reduce_window(x, init, op, window, strides, "SAME")


def dilation(mask: jax.Array, size: int = 3) -> jax.Array:
    return _pool(mask.astype(jnp.float32), jax.lax.max, size)


def erosion(mask: jax.Array, size: int = 3) -> jax.Array:
    return _pool(mask.astype(jnp.float32), jax.lax.min, size)


def opening(mask: jax.Array, size: int = 3) -> jax.Array:
    return dilation(erosion(mask, size), size)


def closing(mask: jax.Array, size: int = 3) -> jax.Array:
    return erosion(dilation(mask, size), size)


def hysteresis_threshold(
    x: jax.Array, low: jax.Array, high: jax.Array, max_iter: int = 256
) -> jax.Array:
    """Pixels above ``high`` seed regions grown into pixels above ``low``
    (skimage ``apply_hysteresis_threshold`` semantics). Propagation is
    dilate-and-mask iterated to fixpoint in a ``lax.while_loop``.

    x: (..., H, W); low/high broadcastable scalars or maps.
    """
    # strict > like skimage.filters.apply_hysteresis_threshold
    weak = (x > low).astype(jnp.float32)
    strong = (x > high).astype(jnp.float32)

    def cond(state):
        cur, prev, it = state
        return jnp.logical_and(jnp.any(cur != prev), it < max_iter)

    def body(state):
        cur, _, it = state
        grown = jnp.minimum(dilation(cur), weak)
        return grown, cur, it + 1

    grown = jnp.minimum(dilation(strong), weak)
    out, _, _ = jax.lax.while_loop(cond, body, (grown, strong, jnp.array(0)))
    return out


def quantile_iqr_thresholds(x: jax.Array, alpha: float = 1.5):
    """(low, high) = (q75, q75 + alpha*IQR) over the full array — the
    reference's adaptive hysteresis levels (``InpaintAnomalyDetector.py:
    156-160``)."""
    q25, q75 = jnp.percentile(x, jnp.asarray([25.0, 75.0]))
    return q75, q75 + alpha * (q75 - q25)
