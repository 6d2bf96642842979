"""Inference-time inpainting anomaly detection.

Reference ``code/src/models/optim/InpaintAnomalyDetector.py``: detect
anomalies in a slice by repeatedly inpainting shifted checkerboard grids
(``_get_grid_mask:229``), collecting per-pixel inpainting-error samples
(``_pixelwise_error:291``), scoring each pixel by the distance of its error
distribution to a null N(0, σ0) — normal-KL (``kl_divergence_normal:332``)
or Wasserstein-1 (``:348``) — hysteresis-thresholding at q75 + α·IQR
(``:156-160``), then iteratively inpaint-correcting the detected anomalies
until the mask stabilizes (``:176-227``). ``robust_anomaly_detect``
(``:407-481``) ensembles detections over flips/rotations with a final
hysteresis vote.

TPU design: all heavy pieces are jitted device programs — grid inpainting
is batched through the generator, the per-pixel error moments accumulate as
masked sums (no gather/reshape of ragged samples), W1 uses a masked sort,
hysteresis/morphology run on device (:mod:`ich_tpu.ops.morphology`). The
reference's per-pixel Python double loop for W1 (``:358-363``) becomes one
vectorized sort. Host code only orchestrates the data-dependent outer
iteration (inference-time control flow).
"""

from __future__ import annotations

import logging
import math
import os
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ich_tpu.ops import morphology as morph

logger = logging.getLogger(__name__)


def make_grid_masks(shape: Tuple[int, int], hole_size=(32, 32), step: int = 4) -> np.ndarray:
    """Shifted checkerboard grid masks (N, H, W); every pixel is covered by
    the same number of grids (reference ``_get_grid_mask:229-259``)."""
    h, w = shape
    hh, hw = hole_size
    # +3 tiles (not +2): when dim % hole exceeds the shift step, the
    # largest shifted window runs past a +2 grid and the slices truncate
    # to unequal shapes (np.stack crash at e.g. 63x63 holes 32 step 16)
    a = np.zeros(h // hh + 3)
    a[::2] = 1
    b = np.zeros(w // hw + 3)
    b[::2] = 1
    grid = np.repeat(np.repeat(np.outer(a, b), hh, axis=0), hw, axis=1)
    masks = [
        grid[i : i + h, j : j + w]
        for i in range(0, 2 * hh, step)
        for j in range(0, 2 * hw, step)
    ]
    return np.stack(masks).astype(np.float32)


class InpaintAnomalyDetector:
    """Grid-inpainting anomaly detector around a trained generator.

    ``inpaint_fn(images (B,H,W,1), masks (B,H,W,1)) -> composite`` — e.g.
    ``SNPatchGAN.inpaint`` or any inpainting callable.
    """

    def __init__(
        self,
        inpaint_fn: Callable,
        grid_hole: Tuple[int, int] = (32, 32),
        grid_step: int = 16,
        batch_size: int = 16,
        use_wasserstein: bool = False,
        alpha01: float = 1.5,
        alpha02: float = 3.0,
        alpha1: float = 1.5,
        alpha2: float = 3.0,
        n_iter: int = 3,
        early_stop: bool = True,
        tol: int = 25,
        inpainting_dilation_radius: Tuple[int, int] = (3, 3),
        grid_anomaly_inpaint: Tuple[Optional[Tuple[int, int]], Optional[Tuple[int, int]]] = (
            (64, 64), (64, 64),
        ),
        cleaning_closing_radius: int = 2,
        cleaning_opening_radius: int = 2,
        shuffle_AD_mask_loader: bool = True,
        seed: int = 0,
    ):
        self.inpaint_fn = inpaint_fn
        self.grid_hole = grid_hole
        self.grid_step = grid_step
        self.batch_size = batch_size
        self.use_wasserstein = use_wasserstein
        if alpha01 > alpha02 or alpha1 > alpha2:
            raise ValueError(
                "hysteresis thresholds need alpha01 <= alpha02 and alpha1 <= alpha2"
            )
        self.alpha01, self.alpha02 = alpha01, alpha02
        self.alpha1, self.alpha2 = alpha1, alpha2
        # randomize the order in which anomaly cells are inpainted, removing
        # the upper-left-first bias (reference InpaintAnomalyDetector.py:398)
        self.shuffle_AD_mask_loader = shuffle_AD_mask_loader
        self.n_iter = n_iter
        self.early_stop = early_stop
        self.tol = tol
        self.inpainting_dilation_radius = inpainting_dilation_radius
        self.grid_anomaly_inpaint = grid_anomaly_inpaint
        self.cleaning_closing_radius = cleaning_closing_radius
        self.cleaning_opening_radius = cleaning_opening_radius
        self.seed = seed

    # -- device subroutines ---------------------------------------------------

    def _error_moments(self, image: jnp.ndarray, grids: jnp.ndarray):
        """Per-pixel (mean, std, count) of inpainting error over grid masks,
        plus (optionally) the raw masked errors for W1. image (H, W)."""
        h, w = image.shape
        bs = self.batch_size
        n = grids.shape[0]
        n_pad = int(math.ceil(n / bs) * bs)
        if n_pad != n:
            grids = jnp.concatenate([grids, jnp.zeros((n_pad - n, h, w))], axis=0)
        img_b = jnp.broadcast_to(image[None, ..., None], (bs, h, w, 1))

        errs = []
        for i in range(0, n_pad, bs):
            g = grids[i : i + bs][..., None]
            out = self.inpaint_fn(img_b, g)
            errs.append((out - img_b)[..., 0] * g[..., 0])
        err = jnp.concatenate(errs, axis=0)[:n]  # masked errors (N, H, W)
        g = grids[:n]
        count = jnp.maximum(jnp.sum(g, axis=0), 1.0)
        mean = jnp.sum(err, axis=0) / count
        var = jnp.sum((err - mean[None]) ** 2 * g, axis=0) / count
        return mean, jnp.sqrt(var), err, g

    @staticmethod
    def kl_divergence_normal(p1, p2, eps=1e-12):
        """KL of per-pixel normals (reference ``:332-346``):
        log(σ1/σ2) + (σ2² + (μ2-μ1)²)/(2σ1²) − 1/2."""
        (m1, s1), (m2, s2) = p1, p2
        return jnp.log(s1 / (s2 + eps) + eps) + (s2**2 + (m2 - m1) ** 2) / (2 * s1**2 + eps) - 0.5

    @staticmethod
    def pixelwise_wasserstein_1(p0_sorted, err, grid, k):
        """W1 between the per-pixel error sample and a null sample: masked
        sort of the N grid errors (uncovered → +inf), first k rows vs the
        sorted null draws. Replaces the reference's per-pixel scipy loop."""
        masked = jnp.where(grid > 0, err, jnp.inf)
        s = jnp.sort(masked, axis=0)[:k]
        return jnp.mean(jnp.abs(s - p0_sorted), axis=0)

    def _distance_map(self, image: jnp.ndarray, grids: jnp.ndarray, key) -> jnp.ndarray:
        mean, std, err, g = self._error_moments(image, grids)
        sigma0 = jnp.maximum(jnp.quantile(std, 0.25), 1e-6)
        std = jnp.maximum(std, 1e-6)
        if self.use_wasserstein:
            k = int(np.asarray(grids).sum(axis=0).min())  # samples per pixel
            p0 = jax.random.normal(key, (k,) + image.shape) * sigma0
            return self.pixelwise_wasserstein_1(jnp.sort(p0, axis=0), err, g, k)
        p0 = (jnp.zeros_like(mean), jnp.ones_like(std) * sigma0)
        return self.kl_divergence_normal(p0, (mean, std))

    def _threshold(self, dmap: jnp.ndarray, a_low: float, a_high: float) -> np.ndarray:
        q25, q75 = jnp.quantile(dmap, 0.25), jnp.quantile(dmap, 0.75)
        t_low = q75 + (q75 - q25) * a_low
        t_high = q75 + (q75 - q25) * a_high
        return np.asarray(morph.hysteresis_threshold(dmap, t_low, t_high)) > 0

    def _inpaint_anomaly(
        self, image: np.ndarray, mask: np.ndarray, grid_dim, rng=None
    ) -> np.ndarray:
        """Sequentially inpaint the anomaly region one coarse grid cell at a
        time for stability (reference ``_inpaint_anomaly:371-405``); with
        ``shuffle_AD_mask_loader`` the cell order is randomized (the
        reference's shuffled DataLoader over the cell masks)."""
        h, w = image.shape
        gh, gw = grid_dim if grid_dim is not None else (h, w)
        cells = [(i, j) for i in range(0, h, gh) for j in range(0, w, gw)]
        if self.shuffle_AD_mask_loader and len(cells) > 1:
            rng = rng or np.random.default_rng(self.seed)
            rng.shuffle(cells)
        im = image[None, ..., None]
        for i, j in cells:
            cell = np.zeros((h, w), np.float32)
            cell[i : i + gh, j : j + gw] = 1
            m = (cell * mask).astype(np.float32)
            if m.sum() == 0:
                continue
            im = self.inpaint_fn(im, m[None, ..., None])
        return np.asarray(im)[0, ..., 0]

    # -- main algorithm ----------------------------------------------------------

    def detect(self, image: np.ndarray, save_dir: Optional[str] = None,
               verbose: bool = False) -> np.ndarray:
        """Detect anomalies in one (H, W) slice; returns a binary mask."""
        image = np.asarray(image, dtype=np.float32)
        if image.ndim == 3:
            image = image[..., 0] if image.shape[-1] in (1,) else image[0]
        h, w = image.shape
        grids = jnp.asarray(make_grid_masks((h, w), self.grid_hole, self.grid_step))
        key = jax.random.PRNGKey(self.seed)
        # ONE generator threaded through every inpaint pass, so the cell
        # order re-randomizes per pass like the reference's shuffled
        # DataLoader (a fresh default_rng(seed) per call would replay the
        # identical permutation every iteration)
        shuffle_rng = np.random.default_rng(self.seed)

        # phase 1: initial detection
        d0 = self._distance_map(jnp.asarray(image), grids, key)
        ma = self._threshold(d0, self.alpha01, self.alpha02)
        if verbose:
            logger.info("Anomalous pixel detected : %d", int(ma.sum()))
        ma_dil = np.asarray(morph.dilation(jnp.asarray(ma, jnp.float32),
                                           2 * self.inpainting_dilation_radius[0] + 1)) > 0
        corrected = self._inpaint_anomaly(image, ma_dil, self.grid_anomaly_inpaint[0],
                                          rng=shuffle_rng)
        if save_dir:
            self._save_step(save_dir, 0, d0, ma, corrected)

        # phase 2: iterative cleanup
        ma_prev = ma
        for i in range(self.n_iter):
            di = self._distance_map(jnp.asarray(corrected), grids, jax.random.fold_in(key, i + 1))
            ma_normal = self._threshold(di, self.alpha1, self.alpha2)
            ma = ma & ~ma_normal
            ma = np.asarray(
                morph.opening(
                    morph.closing(jnp.asarray(ma, jnp.float32), 2 * self.cleaning_closing_radius + 1),
                    2 * self.cleaning_opening_radius + 1,
                )
            ) > 0
            ma_dil = np.asarray(morph.dilation(jnp.asarray(ma, jnp.float32),
                                               2 * self.inpainting_dilation_radius[1] + 1)) > 0
            corrected = self._inpaint_anomaly(image, ma_dil, self.grid_anomaly_inpaint[1],
                                              rng=shuffle_rng)
            if verbose:
                logger.info("| Step %03d/%03d | Remaining anomalous pixels : %d |",
                            i + 1, self.n_iter, int(ma.sum()))
            if save_dir:
                self._save_step(save_dir, i + 1, di, ma, corrected)
            if self.early_stop and (ma_prev ^ ma).sum() < self.tol and i < self.n_iter - 1:
                break
            ma_prev = ma
        return ma

    def _save_step(self, save_dir, i, dmap, ma, corrected=None):
        """Per-step artifacts with the reference's conventions
        (``InpaintAnomalyDetector.py:168-171,215-218``): D{i}.png =
        sqrt(D+1e-12) rescaled min->0 max->255, mA{i}.png = mask x 255,
        im_corrected_{i}.png = corrected image rescaled to [0, 255]."""
        from PIL import Image

        os.makedirs(save_dir, exist_ok=True)

        def _rescale_u8(x):
            x = np.asarray(x, dtype=np.float64)
            x = (x - x.min()) / max(x.max() - x.min(), 1e-12)
            return (x * 255).astype(np.uint8)

        Image.fromarray(_rescale_u8(np.sqrt(np.asarray(dmap) + 1e-12))).save(
            os.path.join(save_dir, f"D{i}.png")
        )
        Image.fromarray((ma * 255).astype(np.uint8)).save(os.path.join(save_dir, f"mA{i}.png"))
        if corrected is not None:
            Image.fromarray(_rescale_u8(corrected)).save(
                os.path.join(save_dir, f"im_corrected_{i}.png")
            )


def robust_anomaly_detect(
    image: np.ndarray,
    ad_inpainter: InpaintAnomalyDetector,
    angles_list: List[float] = (-15.0, -7.5, 7.5, 15.0),
    flip: bool = True,
    lower_frac: float = 0.5,
    upper_frac: float = 0.75,
    save_dir: Optional[str] = None,
    verbose: bool = False,
    return_intermediate: bool = False,
):
    """Ensemble detection over flip/rotation transforms with a final
    hysteresis vote (reference ``robust_anomaly_detect:407-481``)."""
    import scipy.ndimage as ndi

    image = np.asarray(image, dtype=np.float32)
    masks = [ad_inpainter.detect(image, save_dir=_sub(save_dir, "normal"), verbose=verbose)]
    if flip:
        m = ad_inpainter.detect(np.flip(image, axis=1), save_dir=_sub(save_dir, "h-flipped"), verbose=verbose)
        masks.append(np.flip(m, axis=1))
    for ang in angles_list:
        rot = ndi.rotate(image, ang, axes=(1, 0), reshape=False, order=1)
        m = ad_inpainter.detect(rot, save_dir=_sub(save_dir, f"rot{ang}"), verbose=verbose)
        masks.append(ndi.rotate(m.astype(float), -ang, axes=(1, 0), reshape=False, order=0) > 0.5)
        if flip:
            m = ad_inpainter.detect(np.flip(rot, axis=1), save_dir=_sub(save_dir, f"rot{ang}-flip"), verbose=verbose)
            m = np.flip(m, axis=1)
            masks.append(ndi.rotate(m.astype(float), -ang, axes=(1, 0), reshape=False, order=0) > 0.5)

    anomaly_map = np.stack([m.astype(float) for m in masks], axis=0).mean(axis=0)
    final = np.asarray(
        morph.hysteresis_threshold(jnp.asarray(anomaly_map), lower_frac, upper_frac)
    ) > 0
    if return_intermediate:
        return final, anomaly_map, masks
    return final, anomaly_map


def _sub(save_dir, name):
    return os.path.join(save_dir, name) if save_dir else None
