"""FCDD: fully convolutional data description (anomaly localization).

Reference ``code/src/models/networks/FCDD_BaseNet.py`` +
``FCDD_net.py:9-47``: a VGG-11-BN-style conv stack producing a 1-channel
anomaly score map at 1/8 resolution, plus *receptive-field bookkeeping* to
upsample low-resolution score maps back to input resolution with a
Gaussian-kernel transposed convolution (``ReceptiveModule.receptive_upsample
:62``, ``gkern:17``).

The reference tracks receptive-field (size, stride, offset) dynamically
through wrapped Conv/MaxPool modules (``RecConv2d:111``,
``RecMaxPool2d:141``); that bookkeeping is *static metadata* of the
architecture, so here it is computed once analytically
(:func:`receptive_field`) and the Gaussian upsample is a fixed-kernel
``conv_transpose`` with overlap normalization — fully jittable.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ich_tpu.utils.config import NETWORKS

Dtype = Any

# FCDD_CNN_VGG layer plan: (kind, kernel, stride) — conv pads SAME
_VGG_PLAN = (
    ("conv", 3, 1, 64), ("pool", 2, 2, None),
    ("conv", 3, 1, 128), ("pool", 2, 2, None),
    ("conv", 3, 1, 256), ("conv", 3, 1, 256), ("pool", 2, 2, None),
    ("conv", 3, 1, 512), ("conv", 3, 1, 512),
)


def receptive_field(plan=_VGG_PLAN) -> Tuple[int, int]:
    """(receptive field size r, cumulative stride j) of the score map —
    the closed form of the reference's per-layer bookkeeping."""
    r, j = 1, 1
    for kind, k, s, _ in plan:
        r = r + (k - 1) * j
        j = j * s
    return r, j


def gkern(k: int, std: float | None = None) -> jnp.ndarray:
    """2D Gaussian kernel (reference ``FCDD_BaseNet.py:17``)."""
    if std is None:
        std = float(k) / 8.0  # scipy.signal.gaussian default-ish choice in ref
    x = np.arange(k, dtype=np.float64) - (k - 1) / 2.0
    g = np.exp(-0.5 * (x / std) ** 2)
    k2 = np.outer(g, g)
    return jnp.asarray(k2 / k2.sum(), dtype=jnp.float32)


def receptive_upsample(
    scores: jax.Array,
    out_hw: Tuple[int, int],
    r: int | None = None,
    j: int | None = None,
    std: float | None = None,
) -> jax.Array:
    """Upsample a (B, h, w, 1) low-res score map to input resolution by
    spreading each score over its receptive field with a Gaussian kernel
    (transposed conv, stride = cumulative stride), normalized by the
    overlap count (reference ``receptive_upsample:62-110``)."""
    if r is None or j is None:
        r, j = receptive_field()
    kern = gkern(r, std).reshape(r, r, 1, 1)

    def tconv(x):
        # VALID transposed conv = full span (in-1)*j + r, each score spread
        # over its whole receptive field
        return jax.lax.conv_transpose(
            x, kern, strides=(j, j), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    up = tconv(scores.astype(jnp.float32))
    norm = tconv(jnp.ones_like(scores, dtype=jnp.float32))
    up = up / jnp.maximum(norm, 1e-8)
    # score i's receptive field is centered at input coord i*j + (j-1)/2 for
    # the SAME-padded conv stack; crop so centers align with the input grid
    off = max(0, (r - j) // 2)
    return up[:, off : off + out_hw[0], off : off + out_hw[1], :]


class FCDD_CNN_VGG(nn.Module):
    """VGG-11-BN-style anomaly scorer (reference ``FCDD_net.py:9-47``).
    Call with ``ad=False`` to get the 512-channel feature map instead of
    the 1-channel score map."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, ad: bool = True):
        i = 0
        for kind, k, s, ch in _VGG_PLAN:
            if kind == "conv":
                x = nn.Conv(ch, (k, k), padding="SAME", dtype=self.dtype, name=f"conv{i}")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"bn{i}")(x)
                x = nn.relu(x)
                i += 1
            else:
                x = nn.max_pool(x, (k, k), strides=(s, s))
        if ad:
            x = nn.Conv(1, (1, 1), dtype=self.dtype, name="conv_final")(x)
        return x

    @staticmethod
    def heatmap(scores: jax.Array, out_hw: Tuple[int, int], std: float | None = None) -> jax.Array:
        """Pseudo-Huber anomaly heatmap at input resolution: A(x) =
        sqrt(x^2+1)-1 receptive-upsampled (reference ``FCDD.py:242-253``)."""
        a = jnp.sqrt(scores.astype(jnp.float32) ** 2 + 1.0) - 1.0
        return receptive_upsample(a, out_hw, std=std)


NETWORKS.add(
    "FCDD_CNN_VGG", lambda in_shape=None, bias=True, **kw: FCDD_CNN_VGG()
)
