"""Synthetic mask / anomaly rasterization, fully on device.

The reference rasterizes free-form inpainting strokes with ``cv2.line`` /
``cv2.circle`` (``datasets.py:503-540``) and FCDD's synthetic anomalies with
``skimage.draw.ellipse`` (``datasets.py:660-719``) per sample in DataLoader
workers. Here both generators are batched, keyed device programs:

- free-form masks: a random polyline walk (the reference's alternating-
  direction brush) rendered as *distance-to-segment < brush/2* — one
  vectorized pixels×segments computation, no host drawing loops;
- ellipses: the quadratic form of each rotated ellipse evaluated on the
  pixel grid, with per-ellipse intensity and optional gaussian noise.

Everything has static shapes (max counts with validity masking), so mask
generation fuses into the training step.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _segment_distance(py, px, y0, x0, y1, x1, eps=1e-8):
    """Distance of pixels (py, px) [H,W] to segments [(y0,x0)-(y1,x1)] [S].
    Returns (H, W, S)."""
    dy, dx = y1 - y0, x1 - x0
    len2 = dy * dy + dx * dx + eps
    # projection parameter t of each pixel onto each segment, clamped
    t = ((py[..., None] - y0) * dy + (px[..., None] - x0) * dx) / len2
    t = jnp.clip(t, 0.0, 1.0)
    cy = y0 + t * dy
    cx = x0 + t * dx
    return jnp.sqrt((py[..., None] - cy) ** 2 + (px[..., None] - cx) ** 2)


def random_ff_mask(
    key: jax.Array,
    shape: Tuple[int, int],
    n_draw: Tuple[int, int] = (1, 4),
    vertex: Tuple[int, int] = (5, 15),
    brush_width: Tuple[int, int] = (10, 25),
    angle: Tuple[float, float] = (0.5, 2.0),
    length: Tuple[int, int] = (10, 40),
    n_salt_pepper: Tuple[int, int] = (0, 10),
    salt_pepper_radius: Tuple[int, int] = (1, 5),
) -> jax.Array:
    """One random free-form stroke mask (H, W), 1 = region to inpaint.

    Semantics follow the reference's ``random_ff_mask`` (``datasets.py:
    503-540``): per stroke a start point ~ N(center, dim/8), a random base
    direction, then ``n_vertex`` segments of random length whose direction
    alternates around the base angle; plus salt-and-pepper discs. Static
    shapes: max counts are drawn once, extra segments/discs invalidated.
    """
    h, w = shape
    kd, kv, kb, ks, kw_, kn, ka, kl, ksp = jax.random.split(key, 9)
    max_draw, max_vertex = n_draw[1] - 1, vertex[1] - 1
    max_sp = max(n_salt_pepper[1] - 1, 0)

    n_strokes = jax.random.randint(kd, (), n_draw[0], n_draw[1])
    n_vert = jax.random.randint(kv, (max_draw,), vertex[0], vertex[1])
    width = jax.random.randint(kb, (max_draw,), brush_width[0], brush_width[1])
    sx = jax.random.normal(ks, (max_draw,)) * (w / 8) + w / 2
    sy = jax.random.normal(kw_, (max_draw,)) * (h / 8) + h / 2
    beta = jax.random.uniform(kn, (max_draw,), minval=0.0, maxval=6.28)
    angs = jax.random.uniform(
        ka, (max_draw, max_vertex), minval=angle[0], maxval=angle[1]
    )
    lens = jax.random.randint(kl, (max_draw, max_vertex), length[0], length[1]).astype(jnp.float32)

    # build the polyline walk: alternate direction like the reference (:524)
    step_idx = jnp.arange(max_vertex)
    a = beta[:, None] + angs + jnp.where(step_idx[None, :] % 2 == 0, math.pi, 0.0)
    step_y = lens * jnp.cos(a)
    step_x = lens * jnp.sin(a)
    ys = jnp.concatenate([sy[:, None], sy[:, None] + jnp.cumsum(step_y, axis=1)], axis=1)
    xs = jnp.concatenate([sx[:, None], sx[:, None] + jnp.cumsum(step_x, axis=1)], axis=1)

    py = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    px = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1))

    seg_valid = (
        (jnp.arange(max_draw)[:, None] < n_strokes)
        & (jnp.arange(max_vertex)[None, :] < n_vert[:, None])
    ).reshape(-1)
    y0 = ys[:, :-1].reshape(-1)
    x0 = xs[:, :-1].reshape(-1)
    y1 = ys[:, 1:].reshape(-1)
    x1 = xs[:, 1:].reshape(-1)
    half_w = (jnp.broadcast_to(width[:, None], (max_draw, max_vertex)).reshape(-1) / 2.0)
    d = _segment_distance(py, px, y0, x0, y1, x1)  # (H, W, S)
    hit = (d <= half_w[None, None, :]) & seg_valid[None, None, :]
    mask = jnp.any(hit, axis=-1)

    # salt and pepper discs
    if max_sp > 0:
        k1, k2, k3, k4 = jax.random.split(ksp, 4)
        n_sp = jax.random.randint(k1, (), n_salt_pepper[0], n_salt_pepper[1])
        cy = jax.random.randint(k2, (max_sp,), 0, h).astype(jnp.float32)
        cx = jax.random.randint(k3, (max_sp,), 0, w).astype(jnp.float32)
        r = jax.random.randint(k4, (max_sp,), salt_pepper_radius[0], salt_pepper_radius[1]).astype(jnp.float32)
        valid = jnp.arange(max_sp) < n_sp
        d2 = (py[..., None] - cy) ** 2 + (px[..., None] - cx) ** 2
        disc = (d2 <= r**2) & valid[None, None, :]
        mask = mask | jnp.any(disc, axis=-1)

    return mask.astype(jnp.float32)


def random_ff_masks(key: jax.Array, batch: int, shape: Tuple[int, int], **kw) -> jax.Array:
    """Batch of free-form masks: (B, H, W)."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: random_ff_mask(k, shape, **kw))(keys)


def draw_ellipses(
    key: jax.Array,
    shape: Tuple[int, int],
    n_ellipse: Tuple[int, int] = (1, 10),
    major_axis: Tuple[int, int] = (1, 25),
    minor_axis: Tuple[int, int] = (1, 25),
    rotation: Tuple[float, float] = (0.0, 2 * math.pi),
    intensity: Tuple[float, float] = (0.1, 1.0),
    noise: Optional[float] = None,
) -> jax.Array:
    """Random bright ellipses image (H, W): FCDD's synthetic anomalies
    (reference ``draw_ellipses``, ``datasets.py:685-719``). Zero background;
    later ellipses overwrite earlier ones where they overlap."""
    h, w = shape
    kn, kc, kaxis, krot, kint, knoise = jax.random.split(key, 6)
    max_n = n_ellipse[1] - 1
    n = jax.random.randint(kn, (), n_ellipse[0], n_ellipse[1])
    # reference distribution (datasets.py:704-707): centers gaussian around
    # the image center (sigma = dim/6), axes uniform FLOATS with the minor
    # clamped to never exceed the drawn major (row radius = minor, col
    # radius = major, like skimage.draw.ellipse's argument order)
    cy = jax.random.normal(kc, (max_n,)) * (h / 6.0) + h / 2.0
    cx = jax.random.normal(jax.random.fold_in(kc, 1), (max_n,)) * (w / 6.0) + w / 2.0
    maj = jax.random.uniform(
        kaxis, (max_n,), minval=float(major_axis[0]), maxval=float(major_axis[1]))
    rb = maj  # column radius = major axis
    ra = jax.random.uniform(
        jax.random.fold_in(kaxis, 1), (max_n,), minval=float(minor_axis[0]),
        maxval=jnp.minimum(float(minor_axis[1]), maj))  # row radius = minor
    th = jax.random.uniform(krot, (max_n,), minval=rotation[0], maxval=rotation[1])
    val = jax.random.uniform(kint, (max_n,), minval=intensity[0], maxval=intensity[1])
    valid = jnp.arange(max_n) < n

    py = jnp.arange(h, dtype=jnp.float32)[:, None, None]
    px = jnp.arange(w, dtype=jnp.float32)[None, :, None]
    dy = py - cy[None, None, :]
    dx = px - cx[None, None, :]
    yr = dy * jnp.cos(th) + dx * jnp.sin(th)
    xr = -dy * jnp.sin(th) + dx * jnp.cos(th)
    inside = ((yr / jnp.maximum(ra, 1e-3)) ** 2 + (xr / jnp.maximum(rb, 1e-3)) ** 2 <= 1.0) & valid

    out = jnp.zeros((h, w))
    # later ellipses overwrite earlier (scan in order)
    def body(out, i):
        return jnp.where(inside[:, :, i], val[i], out), None

    out, _ = jax.lax.scan(body, out, jnp.arange(max_n))
    if noise is not None:
        g = jax.random.normal(knoise, (h, w)) * noise
        out = jnp.where(out > 0, jnp.clip(out + g, 0.0, 1.0), out)
    return out


def draw_ellipses_batch(key: jax.Array, batch: int, shape: Tuple[int, int], **kw) -> jax.Array:
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: draw_ellipses(k, shape, **kw))(keys)
