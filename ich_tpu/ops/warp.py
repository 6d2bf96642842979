"""Batched affine warping — the geometric-augmentation engine.

The reference applies geometric augmentations one at a time per sample on
the host (scipy ``shift``/``rotate``/``zoom`` chains, reference
``code/src/dataset/transforms.py:158-312``). Here every geometric transform
contributes an *inverse coordinate map* ``p_in = M (p_out - c) + c + o``
(about the image center ``c``), consecutive transforms are fused by matrix
composition, and one batched gather samples the input — a single memory
pass regardless of how many geometric augs are stacked (SURVEY §7 "hard
parts": one map_coordinates-style kernel, order 1 for images / order 0 for
masks).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def identity_affine(batch: int) -> Tuple[jax.Array, jax.Array]:
    m = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (batch, 2, 2))
    o = jnp.zeros((batch, 2), dtype=jnp.float32)
    return m, o


def compose_affine(
    m1: jax.Array, o1: jax.Array, m2: jax.Array, o2: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Fuse inverse maps: transform 1 applied to the image first, then
    transform 2. Combined inverse map = f1 ∘ f2: M = M1 M2, o = M1 o2 + o1."""
    m = jnp.einsum("bij,bjk->bik", m1, m2)
    o = jnp.einsum("bij,bj->bi", m1, o2) + o1
    return m, o


def _sample_coords(
    m: jax.Array, o: jax.Array, h: int, w: int
) -> Tuple[jax.Array, jax.Array]:
    """Input-space (y, x) sample coordinates for every output pixel.
    Returns two (B, H, W) arrays."""
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] - cy  # (H, 1)
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] - cx  # (1, W)
    # p_in = M @ p_centered + c + o
    y_in = (
        m[:, 0, 0, None, None] * yy[None] + m[:, 0, 1, None, None] * xx[None]
        + cy + o[:, 0, None, None]
    )
    x_in = (
        m[:, 1, 0, None, None] * yy[None] + m[:, 1, 1, None, None] * xx[None]
        + cx + o[:, 1, None, None]
    )
    return y_in, x_in


def _gather_2d(img: jax.Array, yi: jax.Array, xi: jax.Array) -> jax.Array:
    """Batched pixel gather: img (B, H, W, C), yi/xi int (B, H', W') ->
    (B, H', W', C). Flattened-index take_along_axis — measurably faster on
    TPU than 2D advanced indexing (gathers run on the scalar core; fewer,
    flatter index vectors help)."""
    b, h, w, c = img.shape
    hp, wp = yi.shape[1:]
    flat = img.reshape(b, h * w, c)
    idx = (yi * w + xi).reshape(b, hp * wp, 1)
    out = jnp.take_along_axis(flat, jnp.broadcast_to(idx, (b, hp * wp, c)), axis=1)
    return out.reshape(b, hp, wp, c)


def affine_warp(
    image: jax.Array,
    m: jax.Array,
    o: jax.Array,
    order: int = 1,
    cval: float = 0.0,
) -> jax.Array:
    """Warp a batch of images by per-sample inverse affine maps.

    image: (B, H, W, C); m: (B, 2, 2); o: (B, 2) (pixel offsets, y then x).
    order 1 = bilinear (images), order 0 = nearest (masks — exact for
    binary data). Out-of-bounds samples get ``cval`` (scipy's default).
    """
    b, h, w = image.shape[:3]
    squeeze = image.ndim == 3
    if squeeze:
        image = image[..., None]
    y, x = _sample_coords(m, o, h, w)
    # scipy mode='constant' semantics: any sample whose *coordinate* falls
    # outside the input extent [0, n-1] is exactly cval (no edge blending)
    in_extent = (y >= 0) & (y <= h - 1) & (x >= 0) & (x <= w - 1)

    if order == 0:
        yi = jnp.round(y).astype(jnp.int32)
        xi = jnp.round(x).astype(jnp.int32)
        yi = jnp.clip(yi, 0, h - 1)
        xi = jnp.clip(xi, 0, w - 1)
        out = _gather_2d(image, yi, xi)
        out = jnp.where(in_extent[..., None], out, cval)
    else:
        y0 = jnp.floor(y)
        x0 = jnp.floor(x)
        wy = (y - y0)[..., None]
        wx = (x - x0)[..., None]
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)

        def corner(dy, dx):
            yi, xi = y0i + dy, x0i + dx
            inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            v = _gather_2d(image, jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1))
            return jnp.where(inb[..., None], v, cval)

        out = (
            corner(0, 0) * (1 - wy) * (1 - wx)
            + corner(0, 1) * (1 - wy) * wx
            + corner(1, 0) * wy * (1 - wx)
            + corner(1, 1) * wy * wx
        )
        out = jnp.where(in_extent[..., None], out, cval)
    return out[..., 0] if squeeze else out
