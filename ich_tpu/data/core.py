"""Array-backed dataset containers.

The reference streams one sample at a time through torch DataLoader worker
processes, each doing numpy/scipy augmentation on the CPU (reference
``src/dataset/datasets.py``; SURVEY §2.2). The TPU design inverts this:
decode everything to dense arrays once (host), optionally park them in HBM,
and draw *batches by index* — augmentation happens on device, batched,
inside the jitted train step.

``SliceDataset2D`` is the container for (slice, mask, patientID, sliceNbr)
records — the schema of ``public_SegICH_Dataset2D`` (``datasets.py:26-94``).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Tuple

import jax
import numpy as np


def batch_indices(
    n: int,
    batch_size: int,
    shuffle: bool,
    rng: Optional[np.random.Generator] = None,
    drop_last: bool = False,
    pad_wrap: bool = True,
) -> Iterator[np.ndarray]:
    """Yield index arrays of exactly ``batch_size`` (static shapes for jit).

    With ``pad_wrap`` the final partial batch is filled by wrapping around
    the permutation (every sample still seen once per epoch; a few seen
    twice) — the static-shape replacement for torch's ragged final batch.
    """
    order = np.arange(n)
    if shuffle:
        rng = rng or np.random.default_rng()
        order = rng.permutation(n)
    full = (n // batch_size) * batch_size
    for i in range(0, full, batch_size):
        yield order[i : i + batch_size]
    rem = n - full
    if rem and not drop_last:
        if pad_wrap:
            # tile until the pad is covered: with n < batch_size/2 a single
            # wrap (order[:batch_size-rem]) is too short and the "exactly
            # batch_size" static-shape contract breaks
            reps = int(np.ceil((batch_size - rem) / n)) + 1
            wrapped = np.tile(order, reps)[: batch_size - rem]
            yield np.concatenate([order[full:], wrapped])
        else:
            yield order[full:]


def _as_f32_keep_device(x):
    """float32 view of ``x``, preserving device residency for jax.Arrays."""
    if isinstance(x, jax.Array):
        import jax.numpy as jnp

        return x if x.dtype == jnp.float32 else x.astype(jnp.float32)
    return np.asarray(x, dtype=np.float32)


@dataclasses.dataclass
class SliceDataset2D:
    """Dense 2D slice dataset: images (N, H, W) or (N, H, W, C) float32,
    masks (N, H, W) {0,1}, vol_ids (N,) int32, slice_nbrs (N,) int32."""

    images: np.ndarray
    masks: np.ndarray
    vol_ids: np.ndarray
    slice_nbrs: np.ndarray

    def __post_init__(self):
        # jax.Arrays (a device_cache()d dataset) must NOT round-trip through
        # np.asarray — that would silently pull the cache back to host numpy
        self.images = _as_f32_keep_device(self.images)
        self.masks = _as_f32_keep_device(self.masks)
        self.vol_ids = np.asarray(self.vol_ids, dtype=np.int32)
        self.slice_nbrs = np.asarray(self.slice_nbrs, dtype=np.int32)
        n = len(self.images)
        if not (len(self.masks) == len(self.vol_ids) == len(self.slice_nbrs) == n):
            raise ValueError("images/masks/vol_ids/slice_nbrs lengths differ")

    def __len__(self) -> int:
        return len(self.images)

    @property
    def image_shape(self) -> Tuple[int, ...]:
        return self.images.shape[1:]

    def nchw_to_dense_vol_index(self) -> Tuple[np.ndarray, np.ndarray]:
        """Map raw volume ids to dense [0, n_volumes) indices.
        Returns (dense_ids (N,), unique_vol_ids (V,))."""
        uniq, dense = np.unique(self.vol_ids, return_inverse=True)
        return dense.astype(np.int32), uniq

    def subset(self, idx: np.ndarray) -> "SliceDataset2D":
        return SliceDataset2D(
            self.images[idx], self.masks[idx], self.vol_ids[idx], self.slice_nbrs[idx]
        )

    def device_cache(self) -> "SliceDataset2D":
        """Move the dense arrays into device memory (HBM-resident cache);
        per-batch gathers then run fully on device."""
        return SliceDataset2D(
            jax.device_put(self.images),  # type: ignore[arg-type]
            jax.device_put(self.masks),  # type: ignore[arg-type]
            self.vol_ids,
            self.slice_nbrs,
        )


@dataclasses.dataclass
class LabeledSliceDataset:
    """Slices + labels for classification pretraining / SSL: images
    (N, H, W[, C]) float32, labels (N,) int or (N, K) multilabel float.
    The schema of the reference's RSNA classification modes
    (``datasets.py:320-422``)."""

    images: np.ndarray
    labels: np.ndarray

    def __post_init__(self):
        self.images = np.asarray(self.images, dtype=np.float32)
        self.labels = np.asarray(self.labels)
        if len(self.images) != len(self.labels):
            raise ValueError("images/labels lengths differ")

    def __len__(self) -> int:
        return len(self.images)

    @property
    def image_shape(self) -> Tuple[int, ...]:
        return self.images.shape[1:]


@dataclasses.dataclass
class VolumeDataset3D:
    """Dense 3D dataset: list of (volume (D, H, W), mask (D, H, W), vol_id).
    Volumes may have different depths; patch sampling makes batches static."""

    volumes: list
    masks: list
    vol_ids: np.ndarray

    def __post_init__(self):
        self.vol_ids = np.asarray(self.vol_ids, dtype=np.int32)
        if not (len(self.volumes) == len(self.masks) == len(self.vol_ids)):
            raise ValueError("volumes/masks/vol_ids lengths differ")

    def __len__(self) -> int:
        return len(self.volumes)
