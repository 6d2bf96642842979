"""CT preprocessing as fused device ops.

TPU-native equivalents of the reference's CPU numpy/scipy preprocessing
(reference ``code/src/utils/ct_utils.py:13-68``). Windowing is a clip+affine,
which XLA fuses into whatever consumes it; resampling uses
``jax.image.resize`` (linear) or a nearest gather (order 0, exact for masks).
Both operate on whole (possibly batched) volumes resident in HBM — the host
only decodes files to arrays.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def window_ct(
    ct_scan: jax.Array,
    win_center: float = 40.0,
    win_width: float = 120.0,
    out_range: Tuple[float, float] = (0.0, 1.0),
) -> jax.Array:
    """HU window: affine rescale so [center-width/2, center+width/2] maps to
    ``out_range``, then clip. Matches reference ``ct_utils.py:13-36``.

    Works on any shape/dtype; returns float32 (or the input float dtype).
    """
    x = ct_scan.astype(jnp.float32) if not jnp.issubdtype(ct_scan.dtype, jnp.floating) else ct_scan
    win_min = win_center - win_width / 2.0
    win_max = win_center + win_width / 2.0
    lo, hi = out_range
    x = (hi - lo) * (x - win_min) / (win_max - win_min) + lo
    return jnp.clip(x, lo, hi)


def _resampled_shape(
    shape: Sequence[int],
    in_pixel_dim: Sequence[float],
    out_pixel_dim: Sequence[float],
) -> Tuple[int, ...]:
    """Output shape under the reference's rounding rule
    (``ct_utils.py:56-58``): round(shape * in_dim / out_dim); ``-1`` in
    out_pixel_dim keeps the input spacing (no resampling on that axis)."""
    in_d = np.asarray(in_pixel_dim, dtype=float)
    out_d = np.asarray(out_pixel_dim, dtype=float).copy()
    out_d[out_d == -1] = in_d[out_d == -1]
    new_shape = np.round(np.asarray(shape) * in_d / out_d).astype(int)
    return tuple(int(s) for s in new_shape)


def resample_ct(
    ct_scan: jax.Array,
    in_pixel_dim: Sequence[float],
    out_pixel_dim: Sequence[float] = (1.0, 1.0, 1.0),
    preserve_range: bool = True,
    order: int = 1,
) -> jax.Array:
    """Resample a volume to a target physical spacing on device.

    Reference semantics (``ct_utils.py:38-68``): per-axis zoom factor
    ``in_dim/out_dim`` with ``-1`` meaning "keep input spacing"; optional
    rescale of the output back to the input's value range. The reference
    uses ``scipy.ndimage.zoom`` splines on the host; here order 0 maps to a
    nearest-neighbor gather (exact for masks) and order>=1 maps to XLA's
    linear resize — interpolation values differ from scipy splines at
    sub-voxel level but spacing/shape semantics are identical.
    """
    new_shape = _resampled_shape(ct_scan.shape, in_pixel_dim, out_pixel_dim)
    if order == 0:
        out = resize_nearest_zoom(ct_scan, new_shape)
    else:
        out = _resize_linear_zoom(ct_scan, new_shape)
    if preserve_range:
        in_min, in_max = jnp.min(ct_scan), jnp.max(ct_scan)
        o_min, o_max = jnp.min(out), jnp.max(out)
        ptp = jnp.maximum(o_max - o_min, jnp.finfo(jnp.float32).tiny)
        out = (in_max - in_min) * (out - o_min) / ptp + in_min
    return out


def resize_nearest(x: jax.Array, shape: Sequence[int]) -> jax.Array:
    """Nearest-neighbor resize via integer gathers on each axis.

    Uses the same index rule as ``skimage.transform.resize(order=0)``:
    output index i samples input index ``floor((i + 0.5) * in/out)`` —
    exact for binary masks, so mask resizes round-trip identically to the
    reference's skimage-based transforms
    (``code/src/dataset/transforms.py:117-156`` order-0 branch). NB this
    is NOT scipy.ndimage.zoom's grid convention — see
    :func:`resize_nearest_zoom` for that one.
    """
    out = x
    for axis, (n_out, n_in) in enumerate(zip(shape, x.shape)):
        if n_out == n_in:
            continue
        idx = jnp.floor((jnp.arange(n_out) + 0.5) * (n_in / n_out)).astype(jnp.int32)
        idx = jnp.clip(idx, 0, n_in - 1)
        out = jnp.take(out, idx, axis=axis)
    return out


def resize_nearest_zoom(x: jax.Array, shape: Sequence[int]) -> jax.Array:
    """Nearest-neighbor resize with ``scipy.ndimage.zoom(order=0)``'s grid
    convention: output index i samples input index
    ``floor(i * (in-1)/(out-1) + 0.5)`` (endpoint-aligned, round-half-up —
    the order-0 spline's rounding, NOT numpy's banker's rounding). This is
    what the reference's ``resample_ct`` does (``ct_utils.py:38-68``,
    ``scipy.ndimage.zoom``), and what its 3D dataset uses for masks
    (``datasets.py:243``, ``order=0``).

    One deliberate deviation: scipy evaluates the endpoint coordinate
    ``(out-1) * (in-1)/(out-1)`` in floating point, and for some shape
    pairs (e.g. 48->24) it lands at ``47.000000000000007`` — OUTSIDE the
    domain — so ``mode='constant'`` silently zeroes the final index of the
    axis. We clamp to the endpoint instead (the intended sample); tests
    exclude that last index when comparing head-to-head."""
    out = x
    for axis, (n_out, n_in) in enumerate(zip(shape, x.shape)):
        if n_out == n_in:
            continue
        if n_out == 1:
            idx = jnp.zeros((1,), jnp.int32)
        else:
            idx = jnp.floor(
                jnp.arange(n_out) * ((n_in - 1) / (n_out - 1)) + 0.5
            ).astype(jnp.int32)
        idx = jnp.clip(idx, 0, n_in - 1)
        out = jnp.take(out, idx, axis=axis)
    return out


def _resize_linear_zoom(x: jax.Array, shape: Sequence[int]) -> jax.Array:
    """Linear resize with ``scipy.ndimage.zoom(order=1)``'s endpoint-aligned
    grid (``in = o * (in-1)/(out-1)``; the reference's default
    ``resampling_order=1``, ``datasets.py:180``). Expressed as
    ``jax.image.scale_and_translate`` with per-axis scale
    ``(out-1)/(in-1)`` and translation ``0.5 - 0.5*scale``; antialias off —
    scipy's order-1 spline does not low-pass when downsampling."""
    dims = [a for a, (o, i) in enumerate(zip(shape, x.shape)) if o != i]
    if not dims:
        return x
    scale = jnp.asarray(
        [
            (shape[a] - 1) / (x.shape[a] - 1) if shape[a] > 1 else 1.0
            for a in dims
        ],
        jnp.float32,
    )
    translation = 0.5 - 0.5 * scale
    return jax.image.scale_and_translate(
        x, tuple(shape), dims, scale, translation,
        method="linear", antialias=False,
    )


def resize(
    x: jax.Array, shape: Sequence[int], order: int = 1
) -> jax.Array:
    """Resize with interpolation order 0 (nearest) or 1 (linear), mirroring
    the reference transform ``Resize`` (``transforms.py:117-156``) which
    resizes images with order 1 and masks with order 0."""
    if order == 0:
        return resize_nearest(x, shape)
    return jax.image.resize(x, tuple(shape), method="linear")
