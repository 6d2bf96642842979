"""On-device 3D patch sampling for patch-based training (BASELINE config 2).

The host-side sampler (``ich_tpu.train.segmentation3d.sample_patches``)
memcpys ~16 MB per 128^3 batch between Python, numpy and the device — on a
tunneled TPU that serial host work is comparable to the train step itself.
This sampler keeps the *whole dataset* HBM-resident (volumes padded to a
common shape, stacked once) and draws each batch inside a single jitted
program: volume choice, foreground-oversampling branch, start-coordinate
clipping and the patch gather are all device ops, so the steady-state
training loop moves no bytes through the host.

Semantics mirror the host sampler exactly (reference behavior: random
patch with probability ``1-pos_frac``, else a patch centered on a uniformly
chosen positive voxel, start clipped into bounds):

- per-volume extents are the *original* dims padded up to the patch size,
  so short volumes are never sampled beyond their (zero-padded) extent;
- the positive-voxel table is capped at ``max_pos`` per volume by uniform
  subsampling (a uniform draw from a uniform subsample is still uniform);
- masks are stored uint8 on device (4x smaller) and cast after the gather.
  Masks are therefore REQUIRED to be binary ({0, >0} -> {0, 1}); graded or
  multi-label masks must use the host sampler (asserted at construction).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def estimate_hbm_bytes(dataset, patch_size: Sequence[int],
                       max_pos: int = 16384) -> int:
    """Bytes the sampler's device stack will occupy, computed from shapes
    alone — callers check a budget with this BEFORE any upload happens."""
    patch = tuple(int(p) for p in patch_size)
    dmax = [0, 0, 0]
    for v in dataset.volumes:
        for a, (s, p) in enumerate(zip(v.shape, patch)):
            dmax[a] = max(dmax[a], s, p)
    n = len(dataset.volumes)
    voxels = n * dmax[0] * dmax[1] * dmax[2]
    return voxels * 4 + voxels * 1 + n * max_pos * 3 * 4  # f32 + u8 + table


class DevicePatchSampler:
    """Jitted batched 3D patch sampler over an HBM-resident volume stack."""

    def __init__(
        self,
        dataset,
        patch_size: Sequence[int],
        pos_frac: float = 0.5,
        max_pos: int = 16384,
        seed_pad: int = 0,
    ):
        patch = tuple(int(p) for p in patch_size)
        n = len(dataset.volumes)
        # per-volume extents after padding up to the patch size (host parity)
        dims = np.asarray(
            [[max(s, p) for s, p in zip(v.shape, patch)] for v in dataset.volumes],
            dtype=np.int32,
        )
        dmax = tuple(int(m) for m in dims.max(axis=0))

        vols = np.zeros((n,) + dmax, dtype=np.float32)
        msks = np.zeros((n,) + dmax, dtype=np.uint8)
        rng = np.random.default_rng(seed_pad)
        pos_tab = np.zeros((n, max_pos, 3), dtype=np.int32)
        pos_cnt = np.zeros((n,), dtype=np.int32)
        for i, (v, m) in enumerate(zip(dataset.volumes, dataset.masks)):
            d, h, w = v.shape
            vols[i, :d, :h, :w] = v
            m = np.asarray(m)
            # binary contract: {0, c} for one positive value c (0/1, 0/255,
            # ...) binarizes exactly like the host path's foreground test;
            # truly graded/multi-label masks must keep their values, which
            # only the host sampler preserves. Single pass, no unique/sort.
            mmax = m.max() if m.size else 0
            if mmax and not ((m == 0) | (m == mmax)).all():
                raise ValueError(
                    "DevicePatchSampler requires binary masks (one positive "
                    "value); graded/multi-label masks must use the host "
                    "sampler (sample_patches)."
                )
            msks[i, :d, :h, :w] = (m > 0).astype(np.uint8)
            pos = np.stack(np.nonzero(msks[i]), axis=1).astype(np.int32)
            if len(pos) > max_pos:
                pos = pos[rng.choice(len(pos), max_pos, replace=False)]
            if len(pos):
                pos_cnt[i] = len(pos)
                # wrap-pad so a uniform index into [0, cnt) via modulo-free
                # gather stays in-table (indices >= cnt are never drawn)
                pos_tab[i, : len(pos)] = pos

        self.patch = patch
        self.pos_frac = float(pos_frac)
        self._vols = jax.device_put(vols)
        self._msks = jax.device_put(msks)
        self._dims = jax.device_put(jnp.asarray(dims))
        self._pos_tab = jax.device_put(jnp.asarray(pos_tab))
        self._pos_cnt = jax.device_put(jnp.asarray(pos_cnt))
        self.hbm_bytes = vols.nbytes + msks.nbytes + pos_tab.nbytes

    def __call__(self, key: jax.Array, batch_size: int):
        """(B, pd, ph, pw) float32 images and masks, fully on device."""
        return _sample_batch(
            self._vols, self._msks, self._dims, self._pos_tab, self._pos_cnt,
            key, int(batch_size), self.patch, self.pos_frac,
        )


@partial(jax.jit, static_argnames=("batch_size", "patch", "pos_frac"))
def _sample_batch(vols, msks, dims, pos_tab, pos_cnt, key, batch_size, patch,
                  pos_frac):
    n = vols.shape[0]
    pd, ph, pw = patch
    half = jnp.asarray([pd // 2, ph // 2, pw // 2], jnp.int32)
    psz = jnp.asarray(patch, jnp.int32)

    def one(k):
        kv, kb, kp, ku = jax.random.split(k, 4)
        vi = jax.random.randint(kv, (), 0, n)
        lim = dims[vi] - psz  # inclusive max start per axis (>= 0)
        cnt = pos_cnt[vi]
        use_pos = jnp.logical_and(
            jax.random.bernoulli(kb, pos_frac), cnt > 0
        )
        j = jax.random.randint(kp, (), 0, jnp.maximum(cnt, 1))
        center = pos_tab[vi, j]
        start_pos = jnp.clip(center - half, 0, lim)
        # exact integer draw (per-axis array bounds) — a float32 u*(lim+1)
        # can round up to lim+1 and bias short volumes into their padding
        start_uni = jax.random.randint(ku, (3,), 0, lim + 1)
        start = jnp.where(use_pos, start_pos, start_uni)
        img = jax.lax.dynamic_slice(
            vols, (vi, start[0], start[1], start[2]), (1, pd, ph, pw)
        )[0]
        msk = jax.lax.dynamic_slice(
            msks, (vi, start[0], start[1], start[2]), (1, pd, ph, pw)
        )[0]
        return img, msk.astype(jnp.float32)

    keys = jax.random.split(key, batch_size)
    imgs, masks = jax.vmap(one)(keys)
    return imgs, masks
