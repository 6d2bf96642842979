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

from ich_tpu.ops.warp import affine_warp
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


class RotateInPlane:
    """Random (H, W)-plane rotation of a volume batch: one angle per
    sample, identical across depth (the anatomically sensible 3D analog of
    the reference's 2D Rotate). Depth folds into the batch so the whole
    volume rotates in a single affine warp."""

    def __init__(self, low: float = -10.0, high: float = 10.0):
        self.low, self.high = low, high

    def _warp(self, x, ang, order):
        # x: (B, D, H, W) -> fold depth into batch, one angle per sample
        b, d, h, w = x.shape[:4]
        had_c = x.ndim == 5
        flat = x.reshape((b * d,) + x.shape[2:])
        th = jnp.deg2rad(jnp.repeat(ang, d))
        c, s = jnp.cos(th), jnp.sin(th)
        m = jnp.stack([jnp.stack([c, s], 1), jnp.stack([-s, c], 1)], 1)
        o = jnp.zeros((b * d, 2))
        out = affine_warp(flat, m, o, order=order)
        return out.reshape(x.shape)

    def __call__(self, key, image, mask=None):
        b = image.shape[0]
        ang = jax.random.uniform(key, (b,), minval=self.low, maxval=self.high)
        out = self._warp(image, ang, order=1)
        if mask is not None:
            return out, self._warp(mask, ang, order=0)
        return out

    def __str__(self):
        return f"RotateInPlane(low={self.low}, high={self.high})"


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


def default_patch_augmentation(
    rotate: Tuple[float, float] = (-10, 10),
    flip_axes: Sequence[int] = (2, 3),
    brightness: Optional[Tuple[float, float]] = (-0.1, 0.1),
) -> Compose3D:
    """The standard 128³-patch augmentation used by the 3D trainer."""
    from ich_tpu.ops.transforms import AdjustBrightness

    parts = [RotateInPlane(*rotate), Flip3D(p=0.5, axes=flip_axes)]
    if brightness is not None:
        parts.append(AdjustBrightness(p=0.5, low=brightness[0], high=brightness[1]))
    return Compose3D(*parts)
