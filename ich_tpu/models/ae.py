"""Convolutional autoencoder (anomaly-detection route).

Reference ``code/src/models/networks/AE_net.py``: strided-conv encoder
(channels double per stride-2 conv, ``Encoder:13``), transposed-conv or
bilinear decoder (``Decoder:41``), Tanh output, BatchNorm throughout.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ich_tpu.models.layers import upsample_linear
from ich_tpu.utils.config import NETWORKS

Dtype = Any


def _bn_relu(x, train, name):
    x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=name)(x)
    return nn.relu(x)


class AEEncoder(nn.Module):
    """Reference ``AE_net.py:13-39``: in-conv (k, s1) then n_conv stride-2
    convs doubling channels, then a k3 s2 bottleneck conv; all torch-style
    symmetric padding (explicit — XLA SAME aligns stride-2 windows
    differently)."""

    latent_channels: int = 64
    bottleneck_channels: int = 64
    n_conv: int = 3
    kernel_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = (self.kernel_size,) * 2
        p = ((self.kernel_size - 1) // 2,) * 2
        x = nn.Conv(self.latent_channels, k, padding=(p, p), dtype=self.dtype, name="in_conv")(x)
        x = _bn_relu(x, train, "in_bn")
        for i in range(self.n_conv):
            ch = self.latent_channels * 2 ** (i + 1)
            x = nn.Conv(ch, k, strides=(2, 2), padding=(p, p), dtype=self.dtype, name=f"conv{i}")(x)
            x = _bn_relu(x, train, f"bn{i}")
        x = nn.Conv(
            self.bottleneck_channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="bottleneck_conv",
        )(x)
        return _bn_relu(x, train, "bottleneck_bn")


class AEDecoder(nn.Module):
    """Reference ``AE_net.py:41-75``. Non-bilinear: bottleneck convT k2 s2,
    then n_conv convTs with kernel ``kernel_size-1`` stride 2 and torch
    padding ``(kernel_size-2)//2`` (flax explicit padding ``k-1-p``).
    Bilinear: ×2 corner-aligned upsample + conv (k3 for the bottleneck,
    ``kernel_size`` for the rest)."""

    latent_channels: int = 64
    out_channels: int = 1
    n_conv: int = 3
    bilinear: bool = False
    kernel_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        chans = [self.latent_channels * 2 ** (i + 1) for i in range(self.n_conv)][::-1]

        def up(x, ch, name, bottleneck=False):
            if self.bilinear:
                x = upsample_linear(x, 2, align_corners=True)
                k = 3 if bottleneck else self.kernel_size
                x = nn.Conv(ch, (k, k), padding=(((k - 1) // 2,) * 2,) * 2,
                            dtype=self.dtype, name=name)(x)
            elif bottleneck:
                x = nn.ConvTranspose(ch, (2, 2), strides=(2, 2), padding="VALID",
                                     dtype=self.dtype, name=name)(x)
            else:
                kt = self.kernel_size - 1
                pt = kt - 1 - (self.kernel_size - 2) // 2
                x = nn.ConvTranspose(ch, (kt, kt), strides=(2, 2),
                                     padding=((pt, pt), (pt, pt)),
                                     dtype=self.dtype, name=name)(x)
            return x

        x = up(x, chans[0], "bottleneck_convT", bottleneck=True)
        x = _bn_relu(x, train, "bottleneck_bn")
        for i, ch in enumerate(chans):
            x = up(x, ch // 2, f"convT{i}")
            x = _bn_relu(x, train, f"bn{i}")
        p = ((self.kernel_size - 1) // 2,) * 2
        x = nn.Conv(self.out_channels, (self.kernel_size,) * 2, padding=(p, p),
                    dtype=self.dtype, name="out_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="out_bn")(x)
        return jnp.tanh(x)


class AENet(nn.Module):
    """Encoder+decoder; call with ``return_bottleneck=True`` for features."""

    in_channels: int = 1
    latent_channels: int = 64
    bottleneck_channels: int = 64
    n_conv: int = 3
    bilinear: bool = False
    kernel_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_bottleneck: bool = False):
        z = AEEncoder(
            latent_channels=self.latent_channels,
            bottleneck_channels=self.bottleneck_channels,
            n_conv=self.n_conv, kernel_size=self.kernel_size,
            dtype=self.dtype, name="encoder",
        )(x, train)
        out = AEDecoder(
            latent_channels=self.latent_channels, out_channels=self.in_channels,
            n_conv=self.n_conv, bilinear=self.bilinear,
            kernel_size=self.kernel_size, dtype=self.dtype, name="decoder",
        )(z, train)
        if return_bottleneck:
            return out, z
        return out


NETWORKS.add(
    "AE_net",
    lambda in_channels=1, latent_channels=64, bottelneck_channels=64, n_conv=3,
    bilinear=False, kernel_size=5, **kw: AENet(
        in_channels=in_channels, latent_channels=latent_channels,
        bottleneck_channels=bottelneck_channels, n_conv=n_conv,
        bilinear=bilinear, kernel_size=kernel_size,
    ),
)
