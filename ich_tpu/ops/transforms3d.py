"""On-device augmentation for 3D patches (BASELINE config 2).

The reference's only 3D augmentation is ``RandomZCrop`` (``transforms.py:
72-115``), subsumed here by the patch sampler. For 128³-style patch
training these add the standard volumetric augmentations, all batched and
keyed, operating on (B, D, H, W[, C]):

- :class:`Flip3D` — random flips along chosen spatial axes,
- :class:`RotateInPlane` — random in-plane (H, W) rotation applied
  slice-wise through the 2D affine-warp engine (depth folded into the
  batch, one warp per batch), image order 1 / mask order 0,
- photometric jitter reuses the 2D ops (elementwise, rank-agnostic):
  :class:`ich_tpu.ops.transforms.AdjustBrightness` / ``AdjustContrast``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ich_tpu.ops.warp import compose_affine, inplane_warp_matmul
from ich_tpu.utils.config import TRANSFORMS


class Flip3D:
    """Random independent flips along the given spatial axes (1=D, 2=H,
    3=W of a (B, D, H, W[, C]) batch)."""

    def __init__(self, p: float = 0.5, axes: Sequence[int] = (2, 3)):
        self.p = p
        self.axes = tuple(axes)

    def __call__(self, key, image, mask=None):
        b = image.shape[0]
        out_i, out_m = image, mask
        for i, ax in enumerate(self.axes):
            flip = jax.random.bernoulli(jax.random.fold_in(key, i), self.p, (b,))
            shape = (-1,) + (1,) * (image.ndim - 1)
            f = flip.reshape(shape)
            out_i = jnp.where(f, jnp.flip(out_i, axis=ax), out_i)
            if out_m is not None:
                fm = flip.reshape((-1,) + (1,) * (out_m.ndim - 1))
                out_m = jnp.where(fm, jnp.flip(out_m, axis=ax), out_m)
        return (out_i, out_m) if mask is not None else out_i

    def __str__(self):
        return f"Flip3D(p={self.p}, axes={list(self.axes)})"


def _rotation_affine(key, batch: int, low: float, high: float):
    ang = jax.random.uniform(key, (batch,), minval=low, maxval=high)
    th = jnp.deg2rad(ang)
    c, s = jnp.cos(th), jnp.sin(th)
    m = jnp.stack([jnp.stack([c, s], 1), jnp.stack([-s, c], 1)], 1)
    return m, jnp.zeros((batch, 2))


def _warp_inplane(x, m, o, rotation_bound_deg: float, order: int):
    """In-plane warp under the same policy as the 2D path
    (:func:`ich_tpu.ops.warp.{image,mask}_warp_method`): the two-pass
    matmul on TPU while the static rotation bound stays away from vertical
    (the matmul clamps |cos| at 0.05 — near-vertical maps corrupt), the
    exact per-slab gather otherwise (wide-angle configs, other
    platforms)."""
    from ich_tpu.ops.warp import (
        affine_warp, image_warp_method, inplane_warp_matmul, mask_warp_method)

    method = (image_warp_method if order == 1 else mask_warp_method)(
        rotation_bound_deg)
    if method == "matmul":
        return inplane_warp_matmul(x, m, o, order=order)
    b, d = x.shape[:2]
    slabs = x.reshape((b * d,) + x.shape[2:])  # (B*D, H, W[, C])
    m_s = jnp.repeat(m, d, axis=0)
    o_s = jnp.repeat(o, d, axis=0)
    out = affine_warp(slabs, m_s, o_s, order=order, method="gather")
    return out.reshape(x.shape)


def _mask_warp_inplane(mask, m, o, rotation_bound_deg: float):
    return _warp_inplane(mask, m, o, rotation_bound_deg, order=0)


class RotateInPlane:
    """Random (H, W)-plane rotation of a volume batch: one angle per
    sample, identical across depth (the anatomically sensible 3D analog of
    the reference's 2D Rotate). Depth rides the matmul N dimension of the
    two-pass warp (:func:`inplane_warp_matmul`) — D× smaller weight
    tensors than per-slab warping, real MXU matmuls."""

    def __init__(self, low: float = -10.0, high: float = 10.0):
        self.low, self.high = low, high

    def __call__(self, key, image, mask=None):
        b = image.shape[0]
        m, o = _rotation_affine(key, b, self.low, self.high)
        bound = max(abs(self.low), abs(self.high))
        out = _warp_inplane(image, m, o, bound, order=1)
        if mask is not None:
            return out, _mask_warp_inplane(mask, m, o, bound)
        return out

    def __str__(self):
        return f"RotateInPlane(low={self.low}, high={self.high})"


class AffineAugment3D:
    """In-plane rotation + H/W flips fused into ONE two-pass warp per batch
    (image order 1, mask order 0 hard one-hot): replaces the
    Rotate→Flip chain's three full-volume memory passes with a single pair
    of batched matmuls over depth."""

    def __init__(self, rotate: Tuple[float, float] = (-10.0, 10.0),
                 p_flip: float = 0.5, flip_h: bool = True, flip_w: bool = True):
        self.rotate = (float(rotate[0]), float(rotate[1]))
        self.p_flip = p_flip
        self.flip_h, self.flip_w = flip_h, flip_w

    def __call__(self, key, image, mask=None):
        b = image.shape[0]
        kr, kh, kw = jax.random.split(key, 3)
        m, o = _rotation_affine(kr, b, *self.rotate)
        one = jnp.ones((b,))
        zero = jnp.zeros((b,))
        sy = jnp.where(jax.random.bernoulli(kh, self.p_flip, (b,)), -1.0, 1.0) if self.flip_h else one
        sx = jnp.where(jax.random.bernoulli(kw, self.p_flip, (b,)), -1.0, 1.0) if self.flip_w else one
        m_flip = jnp.stack([jnp.stack([sy, zero], 1), jnp.stack([zero, sx], 1)], 1)
        m, o = compose_affine(m, o, m_flip, jnp.zeros((b, 2)))
        bound = max(abs(self.rotate[0]), abs(self.rotate[1]))
        out = _warp_inplane(image, m, o, bound, order=1)
        if mask is not None:
            return out, _mask_warp_inplane(mask, m, o, bound)
        return out

    def __str__(self):
        return (f"AffineAugment3D(rotate={self.rotate}, p_flip={self.p_flip}, "
                f"flip_h={self.flip_h}, flip_w={self.flip_w})")


class Compose3D:
    """Sequential 3D pipeline (the 2D photometric ops compose too)."""

    def __init__(self, *transforms):
        self.transforms = tuple(transforms)

    def __call__(self, key, image, mask=None):
        keys = jax.random.split(key, max(1, len(self.transforms)))
        for k, t in zip(keys, self.transforms):
            if mask is not None:
                image, mask = t(k, image, mask)
            else:
                image = t(k, image)
        return (image, mask) if mask is not None else image

    def __str__(self):
        return "Compose3D(\n" + "\n".join("    " + str(t) for t in self.transforms) + "\n)"


TRANSFORMS.add("Flip3D", Flip3D)
TRANSFORMS.add("RotateInPlane", RotateInPlane)
TRANSFORMS.add("AffineAugment3D", AffineAugment3D)


def default_patch_augmentation(
    rotate: Tuple[float, float] = (-10, 10),
    flip_axes: Sequence[int] = (2, 3),
    brightness: Optional[Tuple[float, float]] = (-0.1, 0.1),
) -> Compose3D:
    """The standard 128³-patch augmentation used by the 3D trainer.

    Rotation and in-plane flips fuse into one :class:`AffineAugment3D`
    warp; a depth flip (axis 1), if requested, stays a separate
    :class:`Flip3D` (not expressible as an in-plane affine)."""
    from ich_tpu.ops.transforms import AdjustBrightness

    parts = [AffineAugment3D(rotate, p_flip=0.5,
                             flip_h=2 in flip_axes, flip_w=3 in flip_axes)]
    if 1 in flip_axes:
        parts.append(Flip3D(p=0.5, axes=(1,)))
    if brightness is not None:
        parts.append(AdjustBrightness(p=0.5, low=brightness[0], high=brightness[1]))
    return Compose3D(*parts)
