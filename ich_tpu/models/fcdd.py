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


def receptive_field(plan=_VGG_PLAN) -> Tuple[int, int, float]:
    """(extent r, jump j, shift s) of the score map — the closed form of the
    reference's per-layer bookkeeping (``RecConv2d:128-134``,
    ``RecMaxPool2d:157-163``, initial (j=1, r=1, s=0) at
    ``ReceptiveNet:227``). Conv layers pad (k-1)//2, pools pad 0."""
    r, j, s = 1, 1, 0.0
    for kind, k, st, _ in plan:
        pad = (k - 1) // 2 if kind == "conv" else 0
        r = r + (k - 1) * j
        s = s + ((k - 1) / 2 - pad) * j
        j = j * st
    return r, j, s


def kernel_size_to_std(k: int) -> float:
    """Reference ``FCDD_BaseNet.py:13-15``."""
    return float(np.log10(0.45 * k + 1) + 0.25) if k < 32 else 10.0


def gkern(k: int, std: float | None = None) -> jnp.ndarray:
    """2D Gaussian kernel, reference-faithful (``FCDD_BaseNet.py:17-32``):
    peak-1 (unnormalized); even sizes duplicate the center sample of the
    (k-1)-point window and halve."""
    if std is None:
        std = kernel_size_to_std(k)
    n = k - 1 if k % 2 == 0 else k
    x = np.arange(n, dtype=np.float64) - (n - 1) / 2.0
    g = np.exp(-0.5 * (x / std) ** 2)
    if k % 2 == 0:
        g = np.insert(g, (k - 1) // 2, g[(k - 1) // 2]) / 2.0
    k2 = np.outer(g, g)
    return jnp.asarray(k2, dtype=jnp.float32)


def receptive_upsample(
    scores: jax.Array,
    out_hw: Tuple[int, int],
    r: int | None = None,
    j: int | None = None,
    s: float | None = None,
    std: float | None = None,
) -> jax.Array:
    """Upsample a (B, h, w, 1) low-res score map to input resolution by
    spreading each score over its receptive field with a Gaussian kernel.

    Numerically equivalent to the reference's
    ``ReceptiveModule.receptive_upsample`` (``FCDD_BaseNet.py:62-100``):
    unnormalized Gaussian (std from ``kernel_size_to_std``), transposed conv
    with stride = jump, crop offset ``(r-1)//2 - int(s)`` so receptive-field
    centers align with the input grid. The reference's ``output_padding``
    only ever appends rows/cols beyond the crop window, so a VALID
    transposed conv + crop reproduces it exactly."""
    if r is None or j is None or s is None:
        r, j, s = receptive_field()
    kern = gkern(r, std).reshape(r, r, 1, 1)
    up = jax.lax.conv_transpose(
        scores.astype(jnp.float32), kern, strides=(j, j), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    off = (r - 1) // 2 - int(s)
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
