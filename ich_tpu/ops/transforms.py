"""On-device, batched augmentation pipeline.

TPU-native redesign of the reference's per-sample CPU transform stack
(reference ``code/src/dataset/transforms.py:21-759``; SURVEY §2.2). Every
transform operates on a whole batch (B, H, W[, C]) with an explicit PRNG
key; the mask-aware ``Compose`` keeps the reference's semantics (image-only
or (image, mask) pairs, ``+`` concatenation, pretty ``__str__``) and,
crucially, **fuses consecutive geometric transforms into a single affine
warp** — one gather per batch instead of scipy's shift→rotate→zoom chain.

Conventions: all randomness keyed (one key per call, split internally);
geometric sampling order 1 for images, order 0 (nearest, exact) for masks;
out-of-bounds = 0 like scipy's defaults.

Registered in :data:`ich_tpu.utils.config.TRANSFORMS` under the reference's
class names, plus the reference config typo ``AdjustBrighness`` which would
crash the reference's ``getattr`` (SURVEY §2.10) and is mapped here to
``AdjustBrightness``.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from ich_tpu.ops import ct
from ich_tpu.ops.warp import affine_warp, compose_affine, identity_affine
from ich_tpu.utils.config import TRANSFORMS

Pair = Tuple[jax.Array, Optional[jax.Array]]


def _ensure_batched(x: jax.Array) -> Tuple[jax.Array, bool]:
    if x.ndim == 2:
        return x[None], True
    return x, False


class Transform:
    """Base: ``__call__(key, image, mask=None)`` on batched arrays."""

    def __call__(self, key, image, mask=None):
        raise NotImplementedError

    def __add__(self, other):
        a = self.transforms if isinstance(self, Compose) else (self,)
        b = other.transforms if isinstance(other, Compose) else (other,)
        return Compose(*(a + b))


class AffineTransform(Transform):
    """Geometric transform expressed as a per-sample inverse affine map
    about the image center; fusable in Compose."""

    def affine_params(self, key, batch: int, hw: Tuple[int, int]):
        raise NotImplementedError

    def rotation_bound_deg(self) -> float:
        """Static upper bound on |rotation| this transform can introduce —
        lets callers prove the composed map is far from vertical and route
        order-0 mask warps to the MXU matmul path (see
        :func:`ich_tpu.ops.warp.mask_warp_method`)."""
        return 0.0

    def __call__(self, key, image, mask=None):
        from ich_tpu.ops.warp import image_warp_method, mask_warp_method

        image, sq = _ensure_batched(image)
        m, o = self.affine_params(key, image.shape[0], image.shape[1:3])
        out = affine_warp(image, m, o, order=1,
                          method=image_warp_method(self.rotation_bound_deg()))
        if mask is not None:
            mask_b, _ = _ensure_batched(mask)
            mask_out = affine_warp(
                mask_b, m, o, order=0,
                method=mask_warp_method(self.rotation_bound_deg()),
            )
            mask_out = mask_out if not sq else mask_out[0]
            return (out[0] if sq else out), mask_out
        return out[0] if sq else out


class Translate(AffineTransform):
    """Random xy shift, fractions of H/W (reference ``transforms.py:158-203``:
    ``scipy.ndimage.shift`` order 1 image / 0 mask)."""

    def __init__(self, low: float = -0.1, high: float = 0.1):
        self.low, self.high = low, high

    def affine_params(self, key, batch, hw):
        h, w = hw
        ky, kx = jax.random.split(key)
        sy = jax.random.uniform(ky, (batch,), minval=h * self.low, maxval=h * self.high)
        sx = jax.random.uniform(kx, (batch,), minval=w * self.low, maxval=w * self.high)
        m, o = identity_affine(batch)
        # scipy shift(+s): out[i] = in[i - s]
        return m, jnp.stack([-sy, -sx], axis=1)

    def __str__(self):
        return f"Translate(low={self.low}, high={self.high})"


class Rotate(AffineTransform):
    """Random in-plane rotation in degrees (reference ``transforms.py:269-312``:
    ``scipy.ndimage.rotate(axes=(1,0), reshape=False)``, order 1/0)."""

    def __init__(self, low: float = -10.0, high: float = 10.0):
        self.low, self.high = low, high

    def rotation_bound_deg(self) -> float:
        return max(abs(self.low), abs(self.high))

    def affine_params(self, key, batch, hw):
        ang = jax.random.uniform(key, (batch,), minval=self.low, maxval=self.high)
        # inverse coordinate map matching scipy rotate(angle, axes=(1,0)):
        # output pixel p samples the input at R(-angle) (p - c) + c
        # (calibrated against scipy.ndimage.rotate in tests/test_transforms.py)
        th = jnp.deg2rad(ang)
        c, s = jnp.cos(th), jnp.sin(th)
        m = jnp.stack(
            [jnp.stack([c, s], axis=1), jnp.stack([-s, c], axis=1)], axis=1
        )
        return m, jnp.zeros((batch, 2), dtype=jnp.float32)

    def __str__(self):
        return f"Rotate(low={self.low}, high={self.high})"


class Scale(AffineTransform):
    """Random isotropic zoom about the center, output shape kept by
    crop/pad (reference ``transforms.py:205-267``)."""

    def __init__(self, low: float = 0.9, high: float = 1.1):
        self.low, self.high = low, high

    def affine_params(self, key, batch, hw):
        s = jax.random.uniform(key, (batch,), minval=self.low, maxval=self.high)
        inv = 1.0 / s
        z = jnp.zeros_like(inv)
        m = jnp.stack(
            [jnp.stack([inv, z], axis=1), jnp.stack([z, inv], axis=1)], axis=1
        )
        return m, jnp.zeros((batch, 2), dtype=jnp.float32)

    def __str__(self):
        return f"Scale(low={self.low}, high={self.high})"


class HFlip(AffineTransform):
    """Random horizontal flip — axis 1 (reference ``transforms.py:314-355``)."""

    axis = 1

    def __init__(self, p: float = 0.5):
        self.p = p

    def affine_params(self, key, batch, hw):
        flip = jax.random.bernoulli(key, self.p, (batch,))
        sign = jnp.where(flip, -1.0, 1.0)
        one = jnp.ones_like(sign)
        if self.axis == 1:
            diag = (one, sign)
        else:
            diag = (sign, one)
        z = jnp.zeros_like(sign)
        m = jnp.stack(
            [jnp.stack([diag[0], z], axis=1), jnp.stack([z, diag[1]], axis=1)],
            axis=1,
        )
        return m, jnp.zeros((batch, 2), dtype=jnp.float32)

    def __str__(self):
        return f"{type(self).__name__}(p={self.p})"


class VFlip(HFlip):
    """Random vertical flip — axis 0 (reference ``transforms.py:357-398``)."""

    axis = 0


class RandomCropResize(AffineTransform):
    """torchvision RandomResizedCrop semantics (reference
    ``transforms.py:541-632``): sample area-scale + log-uniform aspect ratio,
    10 tries, central fallback; crop then resize back to the input size —
    expressed here as a pure affine map so it fuses with the rest."""

    def __init__(self, crop_scales=(0.08, 1.0), crop_ratios=(3 / 4, 4 / 3)):
        self.crop_scales = tuple(crop_scales)
        self.crop_ratios = tuple(crop_ratios)

    def affine_params(self, key, batch, hw):
        height, width = hw
        area = height * width
        k1, k2, k3, k4 = jax.random.split(key, 4)
        tries = 10
        target_area = (
            jax.random.uniform(
                k1, (batch, tries),
                minval=self.crop_scales[0], maxval=self.crop_scales[1],
            ) * area
        )
        log_r = jax.random.uniform(
            k2, (batch, tries),
            minval=math.log(self.crop_ratios[0]), maxval=math.log(self.crop_ratios[1]),
        )
        ar = jnp.exp(log_r)
        ws = jnp.round(jnp.sqrt(target_area * ar))
        hs = jnp.round(jnp.sqrt(target_area / ar))
        ok = (ws > 0) & (ws <= width) & (hs > 0) & (hs <= height)
        first = jnp.argmax(ok, axis=1)
        any_ok = jnp.any(ok, axis=1)
        w = jnp.take_along_axis(ws, first[:, None], axis=1)[:, 0]
        h = jnp.take_along_axis(hs, first[:, None], axis=1)[:, 0]
        # central fallback (whole image clamped to ratio bounds)
        in_ratio = width / height
        if in_ratio < min(self.crop_ratios):
            fw, fh = width, round(width / min(self.crop_ratios))
        elif in_ratio > max(self.crop_ratios):
            fh, fw = height, round(height * max(self.crop_ratios))
        else:
            fw, fh = width, height
        w = jnp.where(any_ok, w, fw)
        h = jnp.where(any_ok, h, fh)
        iy = jnp.floor(
            jax.random.uniform(k3, (batch,)) * (height - h + 1)
        )
        jx = jnp.floor(jax.random.uniform(k4, (batch,)) * (width - w + 1))
        iy = jnp.where(any_ok, iy, (height - h) // 2)
        jx = jnp.where(any_ok, jx, (width - w) // 2)
        # inverse map with half-pixel centers (skimage resize convention):
        # y_in = (y_out + 0.5) * h/H - 0.5 + iy ; expressed about the center.
        sy, sx = h / height, w / width
        z = jnp.zeros_like(sy)
        m = jnp.stack(
            [jnp.stack([sy, z], axis=1), jnp.stack([z, sx], axis=1)], axis=1
        )
        cy, cx = (height - 1) / 2.0, (width - 1) / 2.0
        oy = (cy + 0.5) * sy - 0.5 + iy - cy
        ox = (cx + 0.5) * sx - 0.5 + jx - cx
        return m, jnp.stack([oy, ox], axis=1)

    def __str__(self):
        return (
            f"RandomCropResize(crop_scales={self.crop_scales}, "
            f"crop_ratios={self.crop_ratios})"
        )


class Resize(Transform):
    """Deterministic resize to (H, W): order 1 image / order 0 mask
    (reference ``transforms.py:117-156``)."""

    def __init__(self, H: int = 256, W: int = 256):
        self.H, self.W = H, W

    def __call__(self, key, image, mask=None):
        image, sq = _ensure_batched(image)
        shape = (image.shape[0], self.H, self.W) + image.shape[3:]
        out = ct.resize(image, shape, order=1)
        if mask is not None:
            mask_b, _ = _ensure_batched(mask)
            mshape = (mask_b.shape[0], self.H, self.W) + mask_b.shape[3:]
            mout = ct.resize(mask_b, mshape, order=0)
            return (out[0] if sq else out), (mout[0] if sq else mout)
        return out[0] if sq else out

    def __str__(self):
        return f"Resize(H={self.H}, W={self.W})"


class GaussianBlur(Transform):
    """Random gaussian blur with per-sample sigma (reference
    ``transforms.py:400-443``: ``skimage.filters.gaussian``), as a
    separable depthwise conv with per-sample kernels."""

    def __init__(self, p: float = 0.5, sigma: Tuple[float, float] = (0.1, 2.0)):
        self.p = p
        self.sigma = tuple(sigma)
        # One static radius sized for the max sigma (skimage truncates at
        # 4*sigma per draw; per-sample radii would be dynamic shapes). A
        # sigma=0.1 draw thus convolves with a radius-8 kernel whose tails
        # are ~0 — numerically identical, and the fixed shape is what lets
        # the whole batch blur as two batched matmuls. At the default
        # sigma range this is 17 taps x 2 passes on a 256^2 batch: well
        # under 1 ms inside the fused augmentation step (BENCHMARKS.md).
        self.radius = max(1, int(math.ceil(4.0 * self.sigma[1])))

    def _kernels(self, key, batch):
        kp, ks = jax.random.split(key)
        apply = jax.random.bernoulli(kp, self.p, (batch,))
        sig = jax.random.uniform(
            ks, (batch,), minval=self.sigma[0], maxval=self.sigma[1]
        )
        r = self.radius
        xs = jnp.arange(-r, r + 1, dtype=jnp.float32)
        k = jnp.exp(-0.5 * (xs[None, :] / sig[:, None]) ** 2)
        k = k / jnp.sum(k, axis=1, keepdims=True)
        delta = (xs == 0).astype(jnp.float32)
        return jnp.where(apply[:, None], k, delta[None, :])  # (B, K)

    def __call__(self, key, image, mask=None):
        image, sq = _ensure_batched(image)
        had_c = image.ndim == 4
        x = image if had_c else image[..., None]
        b, h, w, c = x.shape
        kern = self._kernels(key, b)  # (B, K)
        kk = kern.shape[1]
        r = self.radius
        # fold batch into channels for per-sample depthwise conv
        xg = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, h, w, b * c)
        kfull = jnp.repeat(kern, c, axis=0).T  # (K, B*C)
        # vertical pass (edge padding = skimage 'nearest' mode)
        xp = jnp.pad(xg, ((0, 0), (r, r), (0, 0), (0, 0)), mode="edge")
        rhs_v = kfull.reshape(kk, 1, 1, b * c)
        xg = jax.lax.conv_general_dilated(
            xp, rhs_v, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=b * c,
        )
        # horizontal pass
        xp = jnp.pad(xg, ((0, 0), (0, 0), (r, r), (0, 0)), mode="edge")
        rhs_h = kfull.reshape(1, kk, 1, b * c)
        xg = jax.lax.conv_general_dilated(
            xp, rhs_h, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=b * c,
        )
        out = jnp.transpose(xg.reshape(h, w, b, c), (2, 0, 1, 3))
        if not had_c:
            out = out[..., 0]
        if sq:
            out = out[0]
        return (out, mask) if mask is not None else out

    def __str__(self):
        return f"GaussianBlur(sigma={self.sigma}, p={self.p})"


class AdjustBrightness(Transform):
    """Additive brightness jitter, clipped to [0, 1] (reference
    ``transforms.py:445-491``)."""

    def __init__(self, p: float = 0.5, low: float = -0.3, high: float = 0.2):
        self.p, self.low, self.high = p, low, high

    def _factors(self, key, batch):
        kp, kf = jax.random.split(key)
        apply = jax.random.bernoulli(kp, self.p, (batch,))
        f = jax.random.uniform(kf, (batch,), minval=self.low, maxval=self.high)
        return apply, f

    def __call__(self, key, image, mask=None):
        image, sq = _ensure_batched(image)
        apply, f = self._factors(key, image.shape[0])
        shape = (-1,) + (1,) * (image.ndim - 1)
        out = jnp.where(
            apply.reshape(shape),
            jnp.clip(image + f.reshape(shape), 0.0, 1.0),
            image,
        )
        if sq:
            out = out[0]
        return (out, mask) if mask is not None else out

    def __str__(self):
        return f"AdjustBrightness(p={self.p}, low={self.low}, high={self.high})"


class AdjustContrast(AdjustBrightness):
    """Multiplicative contrast jitter, clipped to [0, 1] (reference
    ``transforms.py:493-539``)."""

    def __init__(self, p: float = 0.5, low: float = 0.5, high: float = 1.5):
        super().__init__(p=p, low=low, high=high)

    def __call__(self, key, image, mask=None):
        image, sq = _ensure_batched(image)
        apply, f = self._factors(key, image.shape[0])
        shape = (-1,) + (1,) * (image.ndim - 1)
        out = jnp.where(
            apply.reshape(shape),
            jnp.clip(image * f.reshape(shape), 0.0, 1.0),
            image,
        )
        if sq:
            out = out[0]
        return (out, mask) if mask is not None else out

    def __str__(self):
        return f"AdjustContrast(p={self.p}, low={self.low}, high={self.high})"


class RandomZCrop(Transform):
    """Random fixed-size crop along the z (last spatial) axis of volumes
    (reference ``transforms.py:72-115``): (B, H, W, D) → (B, H, W, Z)."""

    def __init__(self, Z: int = 64):
        self.Z = Z

    def __call__(self, key, image, mask=None):
        single = image.ndim == 3
        img = image[None] if single else image
        b = img.shape[0]
        d = img.shape[3]
        z0 = jax.random.randint(key, (b,), 0, d - self.Z)

        def crop(x, z):
            return jax.lax.dynamic_slice_in_dim(x, z, self.Z, axis=2)

        out = jax.vmap(crop)(img, z0)
        if mask is not None:
            mk = mask[None] if single else mask
            mout = jax.vmap(crop)(mk, z0)
            return (out[0] if single else out), (mout[0] if single else mout)
        return out[0] if single else out

    def __str__(self):
        return f"RandomZCrop(Z={self.Z})"


class RandomPatchSwap(Transform):
    """Context-restoration corruption (Chen 2019; reference
    ``transforms.py:672-759``): swap ``n`` pairs of non-overlapping patches,
    optionally with random 90° rotations, identically on image and mask.

    Static-shape formulation: patches are carried in a ``S×S`` buffer
    (S = max sampled size) with a validity mask; candidate positions are
    drawn with a fixed number of retries (the reference retries until
    non-overlap; 10 vectorized tries make failure vanishingly rare for the
    reference's configs). The whole thing is vmapped over the batch.
    """

    def __init__(
        self,
        n: int = 10,
        w: Union[int, Sequence[int]] = (10, 30),
        h: Union[int, Sequence[int]] = (10, 30),
        rotate: bool = False,
        tries: int = 10,
    ):
        self.n = n
        self.w = tuple(w) if isinstance(w, (list, tuple)) else (int(w), int(w) + 1)
        self.h = tuple(h) if isinstance(h, (list, tuple)) else (int(h), int(h) + 1)
        self.rotate = rotate
        self.tries = tries
        self.S = max(self.w[1], self.h[1])  # static buffer size

    def _sample_geom(self, key, hw):
        """One swap's (h, w, p1, p2, rot1, rot2) for one sample."""
        H, W = hw
        kw, kh, kp, kr = jax.random.split(key, 4)
        w = jax.random.randint(kw, (), self.w[0], self.w[1])
        if self.rotate:
            h = w
        else:
            h = jax.random.randint(kh, (), self.h[0], self.h[1])
        # candidate pairs, keep the first non-overlapping
        ks = jax.random.split(kp, self.tries)
        cand = jax.vmap(
            lambda k: jax.random.uniform(k, (4,))
        )(ks)
        p1 = jnp.stack(
            [jnp.floor(cand[:, 0] * (H - h)), jnp.floor(cand[:, 1] * (W - w))], 1
        ).astype(jnp.int32)
        p2 = jnp.stack(
            [jnp.floor(cand[:, 2] * (H - h)), jnp.floor(cand[:, 3] * (W - w))], 1
        ).astype(jnp.int32)
        ok = ~(
            (jnp.abs(p1[:, 0] - p2[:, 0]) <= h)
            & (jnp.abs(p1[:, 1] - p2[:, 1]) <= w)
        )
        first = jnp.argmax(ok)
        p1, p2 = p1[first], p2[first]
        r1 = jax.random.randint(kr, (), 0, 4) if self.rotate else jnp.zeros((), jnp.int32)
        r2 = (
            jax.random.randint(jax.random.fold_in(kr, 1), (), 0, 4)
            if self.rotate
            else jnp.zeros((), jnp.int32)
        )
        return h, w, p1, p2, r1, r2

    def _rotate_buffer(self, buf, valid, k):
        """rot90^k of the top-left valid region of an S×S(-channel) buffer,
        result re-anchored at the top-left."""
        S = self.S

        def rot(kk):
            b2 = jnp.rot90(buf, kk, axes=(0, 1))
            v2 = jnp.rot90(valid, kk, axes=(0, 1))
            # roll content back to top-left corner
            nz_r = jnp.argmax(jnp.any(v2 > 0, axis=1))
            nz_c = jnp.argmax(jnp.any(v2 > 0, axis=0))
            return (
                jnp.roll(b2, (-nz_r, -nz_c), axis=(0, 1)),
                jnp.roll(v2, (-nz_r, -nz_c), axis=(0, 1)),
            )

        return jax.lax.switch(k, [lambda i=i: rot(i) for i in range(4)])

    def _swap_one(self, key, img):
        """All n swaps for one (H, W[, C]) image (or image+mask stacked on
        the channel axis — swaps are identical across channels)."""
        S = self.S
        had_c = img.ndim == 3
        x = img if had_c else img[..., None]
        H, W, C = x.shape
        xp = jnp.pad(x, ((0, S), (0, S), (0, 0)))

        def body(xp, k):
            h, w, p1, p2, r1, r2 = self._sample_geom(k, (H, W))
            rows = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
            valid = ((rows < h) & (cols < w)).astype(x.dtype)
            patch1 = jax.lax.dynamic_slice(xp, (p1[0], p1[1], 0), (S, S, C))
            patch2 = jax.lax.dynamic_slice(xp, (p2[0], p2[1], 0), (S, S, C))
            rp2, v1 = self._rotate_buffer(patch2, valid, r1)  # goes to p1
            rp1, v2 = self._rotate_buffer(patch1, valid, r2)  # goes to p2
            reg1 = patch1 * (1 - v1[..., None]) + rp2 * v1[..., None]
            xp2 = jax.lax.dynamic_update_slice(xp, reg1, (p1[0], p1[1], 0))
            patch2b = jax.lax.dynamic_slice(xp2, (p2[0], p2[1], 0), (S, S, C))
            reg2 = patch2b * (1 - v2[..., None]) + rp1 * v2[..., None]
            xp2 = jax.lax.dynamic_update_slice(xp2, reg2, (p2[0], p2[1], 0))
            return xp2, None

        keys = jax.random.split(key, self.n)
        xp, _ = jax.lax.scan(body, xp, keys)
        out = xp[:H, :W]
        return out if had_c else out[..., 0]

    def __call__(self, key, image, mask=None):
        image, sq = _ensure_batched(image)
        b = image.shape[0]
        keys = jax.random.split(key, b)
        if mask is not None:
            mask_b, _ = _ensure_batched(mask)
            had_c = image.ndim == 4
            x = image if had_c else image[..., None]
            mk = mask_b if mask_b.ndim == 4 else mask_b[..., None]
            ci = x.shape[-1]
            stacked = jnp.concatenate([x, mk.astype(x.dtype)], axis=-1)
            out = jax.vmap(self._swap_one)(keys, stacked)
            img_out, mask_out = out[..., :ci], out[..., ci:]
            if not had_c:
                img_out = img_out[..., 0]
            if mask_b.ndim == 3:
                mask_out = mask_out[..., 0]
            if sq:
                img_out, mask_out = img_out[0], mask_out[0]
            return img_out, mask_out
        out = jax.vmap(self._swap_one)(keys, image)
        return out[0] if sq else out

    def __str__(self):
        return (
            f"RandomPatchSwap(n={self.n}, w={list(self.w)}, h={list(self.h)}, "
            f"rotate={self.rotate})"
        )


class ToTensor(Transform):
    """Array passthrough ensuring a channel axis; masks stay {0,1} floats
    (the reference's ``ToTorchTensor``, ``transforms.py:634-670``, is a
    host→torch conversion with no device-side equivalent needed)."""

    def __call__(self, key, image, mask=None):
        image, sq = _ensure_batched(image)
        if image.ndim == 3:
            image = image[..., None]
        out = image[0] if sq else image
        if mask is not None:
            mask_b, msq = _ensure_batched(mask)
            if mask_b.ndim == 3:
                mask_b = mask_b[..., None]
            return out, (mask_b[0] if msq else mask_b)
        return out

    def __str__(self):
        return "ToTensor()"


class Compose(Transform):
    """Mask-aware pipeline with affine fusion (reference
    ``transforms.py:21-70``: image-only or pairs, ``+`` concat, ``__str__``).

    Consecutive :class:`AffineTransform` instances are composed into one
    warp (single gather per run of geometric transforms)."""

    def __init__(self, *transforms: Transform):
        self.transforms = tuple(transforms)

    def __call__(self, key, image, mask=None):
        segments = []
        run = []
        for t in self.transforms:
            if isinstance(t, AffineTransform):
                run.append(t)
            else:
                if run:
                    segments.append(("affine", tuple(run)))
                    run = []
                segments.append(("point", t))
        if run:
            segments.append(("affine", tuple(run)))

        keys = jax.random.split(key, max(1, len(self.transforms)))
        ki = 0
        has_mask = mask is not None
        for kind, seg in segments:
            if kind == "affine":
                from ich_tpu.ops.warp import image_warp_method, mask_warp_method

                img_b, sq = _ensure_batched(image)
                b, hw = img_b.shape[0], img_b.shape[1:3]
                m, o = identity_affine(b)
                bound = sum(t.rotation_bound_deg() for t in seg)
                for t in seg:
                    mt, ot = t.affine_params(keys[ki], b, hw)
                    ki += 1
                    m, o = compose_affine(m, o, mt, ot)
                image = affine_warp(img_b, m, o, order=1,
                                    method=image_warp_method(bound))
                if sq:
                    image = image[0]
                if has_mask:
                    mask_b, msq = _ensure_batched(mask)
                    mask = affine_warp(
                        mask_b, m, o, order=0, method=mask_warp_method(bound)
                    )
                    if msq:
                        mask = mask[0]
            else:
                if has_mask:
                    image, mask = seg(keys[ki], image, mask)
                else:
                    image = seg(keys[ki], image)
                ki += 1
        return (image, mask) if has_mask else image

    def __str__(self):
        names = "\n".join("    " + str(t) for t in self.transforms)
        return f"Compose(\n{names}\n)"


def build_pipeline(spec: dict) -> Compose:
    """Build a Compose from a JSON config dict {TransformName: kwargs}
    (the reference resolves these with ``getattr(tf, name)(**kwargs)``,
    ``UNet2D_scripts.py:128``; here through the explicit registry)."""
    return Compose(*(TRANSFORMS.build(name, **(kw or {})) for name, kw in spec.items()))


for _cls in [
    Translate, Rotate, Scale, HFlip, VFlip, Resize, GaussianBlur,
    AdjustBrightness, AdjustContrast, RandomCropResize, RandomZCrop,
    RandomPatchSwap, ToTensor,
]:
    TRANSFORMS.add(_cls.__name__, _cls)
TRANSFORMS.add("ToTorchTensor", ToTensor)
# reference config typo (GlobalContrastive_config.json) — accept and correct
TRANSFORMS.add("AdjustBrighness", AdjustBrightness)
