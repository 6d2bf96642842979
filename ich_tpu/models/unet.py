"""U-Net family: full U-Net (2D/3D), encoder-only, and partial-decoder
variants, with MLP / 1x1-conv projection heads.

Re-designed from the behavior of the reference's
``code/src/models/networks/UNet.py`` (filter arithmetic at ``:61-63``,
double-conv blocks at ``:129-177``, encoder at ``:245-326``, partial U-Net
at ``:328-435``) as flax modules in channels-last layout. ``return_bottleneck``
is a call argument (not mutable module state as in the reference at ``:55``),
keeping the modules pure for jit.

Encoder submodule names are identical across UNet / UNetEncoder /
PartialUNet (``down_0..down_{d-2}``, ``bottleneck``) so pretrained encoder
weights transfer by parameter-path intersection — the same mechanism as the
reference's ``transfer_weights`` (``UNet2D.py:316-337``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ich_tpu.models.layers import (
    ConvBlock,
    ConvHead,
    MLPHead,
    max_pool,
    normalize_p_dropout,
    upsample_linear,
    UpConv,
)
from ich_tpu.utils.config import NETWORKS

Dtype = Any


def _filter_plan(depth: int, top_filter: int) -> Tuple[list, Tuple[int, int], list]:
    """The reference's filter arithmetic (``UNet.py:61-63``): channels double
    per encoder level from ``top_filter``; decoder halves back."""
    down = [top_filter * (2**d) for d in range(depth - 1)]
    bottleneck = top_filter * (2 ** (depth - 1))
    up = [top_filter * (2 ** (d - 1)) for d in range(depth - 1, 0, -1)]
    return down, bottleneck, up


def _block_cls(remat: bool):
    """ConvBlock, optionally wrapped in gradient checkpointing.

    ``nn.remat`` keeps parameter paths identical (lifted transform), so
    remat'd and plain networks share checkpoints/transfer. ``train`` (arg 2,
    counting self) is static: it drives Python control flow (dropout gate,
    BatchNorm mode). Used for big 3D patches where storing every
    double-conv activation for the backward pass exceeds HBM — remat
    recomputes inside each block, storing only block boundaries."""
    if not remat:
        return ConvBlock
    return nn.remat(ConvBlock, static_argnums=(2,))


class _Encoder(nn.Module):
    """Shared analysis path: depth-1 double-conv blocks with 2x max-pool
    between, then the bottleneck double-conv. Returns (skips, bottleneck)."""

    depth: int = 5
    ndim: int = 2
    top_filter: int = 64
    midchannels_factor: int = 2
    p_dropout: Union[float, Sequence[float]] = 0.5
    norm: str = "batch"
    gated: bool = False
    axis_name: Optional[str] = None
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        p_drop = normalize_p_dropout(self.p_dropout, self.depth)
        down, bottleneck, _ = _filter_plan(self.depth, self.top_filter)
        Block = _block_cls(self.remat)
        skips = []
        for i, ch in enumerate(down):
            x = Block(
                ch,
                mid_channels=ch // self.midchannels_factor,
                ndim=self.ndim,
                p_dropout=p_drop[i],
                norm=self.norm,
                gated=self.gated,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"down_{i}",
            )(x, train)
            skips.append(x)
            x = max_pool(x, self.ndim)
        x = Block(
            bottleneck,
            mid_channels=bottleneck // self.midchannels_factor,
            ndim=self.ndim,
            p_dropout=p_drop[-1],
            norm=self.norm,
            gated=self.gated,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="bottleneck",
        )(x, train)
        return skips, x


class _Decoder(nn.Module):
    """Synthesis path: n_stages of (upsample, concat skip, double conv)."""

    depth: int = 5
    n_stages: Optional[int] = None  # None -> full depth-1
    ndim: int = 2
    top_filter: int = 64
    bilinear: bool = False
    norm: str = "batch"
    gated: bool = False
    axis_name: Optional[str] = None
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skips: Sequence[jax.Array], train: bool = False):
        _, _, up = _filter_plan(self.depth, self.top_filter)
        n = self.n_stages if self.n_stages is not None else self.depth - 1
        Block = _block_cls(self.remat)
        for i, ch in enumerate(up[:n]):
            if self.bilinear:
                x = upsample_linear(x, self.ndim)
            else:
                x = UpConv(ch, ndim=self.ndim, dtype=self.dtype, name=f"up_samp_{i}")(x)
            skip = skips[len(skips) - 1 - i]
            x = jnp.concatenate([skip, x], axis=-1)
            x = Block(
                ch,
                mid_channels=ch,
                ndim=self.ndim,
                norm=self.norm,
                gated=self.gated,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"up_{i}",
            )(x, train)
        return x


class UNet(nn.Module):
    """2D/3D U-Net (reference ``UNet.py:18-127``).

    Input/output are channels-last: (B, H, W, C) or (B, D, H, W, C) —
    ``ndim`` replaces the reference's ``use_3D`` flag. Final 1x1 conv +
    sigmoid (1 class) / softmax (>1), gated by ``use_final_activation``.
    Call with ``return_bottleneck=True`` to also get bottleneck features.

    ``remat=True`` wraps every double-conv block in ``jax.checkpoint``
    (activations recomputed in the backward pass) — required for big-3D
    -patch training (e.g. bs2 x 128³) whose stored activations otherwise
    exceed a v5e chip's HBM; parameter paths are unchanged, so
    checkpoints/transfer interoperate with ``remat=False`` nets.
    """

    depth: int = 5
    ndim: int = 2
    bilinear: bool = False
    out_channels: int = 1
    top_filter: int = 64
    midchannels_factor: int = 2
    p_dropout: Union[float, Sequence[float]] = 0.5
    use_final_activation: bool = True
    norm: str = "batch"
    gated: bool = False
    axis_name: Optional[str] = None
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, return_bottleneck: bool = False
    ):
        skips, x = _Encoder(
            depth=self.depth,
            ndim=self.ndim,
            top_filter=self.top_filter,
            midchannels_factor=self.midchannels_factor,
            p_dropout=self.p_dropout,
            norm=self.norm,
            gated=self.gated,
            axis_name=self.axis_name,
            remat=self.remat,
            dtype=self.dtype,
            name="encoder",
        )(x, train)
        bottleneck = x
        x = _Decoder(
            depth=self.depth,
            ndim=self.ndim,
            top_filter=self.top_filter,
            bilinear=self.bilinear,
            norm=self.norm,
            gated=self.gated,
            axis_name=self.axis_name,
            remat=self.remat,
            dtype=self.dtype,
            name="decoder",
        )(x, skips, train)
        x = nn.Conv(
            self.out_channels, (1,) * self.ndim, dtype=self.dtype, name="final_conv"
        )(x)
        x = x.astype(jnp.float32)
        if self.use_final_activation:
            x = jax.nn.softmax(x, axis=-1) if self.out_channels > 1 else jax.nn.sigmoid(x)
        if return_bottleneck:
            return x, bottleneck
        return x


class UNetEncoder(nn.Module):
    """Encoder + global average pool + MLP projection head (global
    contrastive / classification pretraining; reference ``UNet.py:245-326``).

    ``mlp_head`` lists the head's hidden/output sizes, e.g. [256, 128]."""

    depth: int = 5
    ndim: int = 2
    mlp_head: Sequence[int] = (256, 128)
    top_filter: int = 64
    midchannels_factor: int = 2
    p_dropout: Union[float, Sequence[float]] = 0.5
    norm: str = "batch"
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, return_bottleneck: bool = False
    ):
        _, x = _Encoder(
            depth=self.depth,
            ndim=self.ndim,
            top_filter=self.top_filter,
            midchannels_factor=self.midchannels_factor,
            p_dropout=self.p_dropout,
            norm=self.norm,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="encoder",
        )(x, train)
        pooled = jnp.mean(x, axis=tuple(range(1, 1 + self.ndim)))  # global avg pool
        out = MLPHead(self.mlp_head, dtype=self.dtype, name="mlp_head")(pooled)
        if return_bottleneck:
            return out, pooled
        return out


class PartialUNet(nn.Module):
    """Encoder + first ``n_decoder`` decoder stages + 1x1-conv head (local
    contrastive, Chaitanya 2020; reference ``UNet.py:328-435``)."""

    depth: int = 5
    n_decoder: int = 3
    ndim: int = 2
    bilinear: bool = False
    head_channel: Sequence[int] = (64, 32)
    top_filter: int = 64
    midchannels_factor: int = 2
    p_dropout: Union[float, Sequence[float]] = 0.5
    norm: str = "batch"
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, return_bottleneck: bool = False
    ):
        skips, x = _Encoder(
            depth=self.depth,
            ndim=self.ndim,
            top_filter=self.top_filter,
            midchannels_factor=self.midchannels_factor,
            p_dropout=self.p_dropout,
            norm=self.norm,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="encoder",
        )(x, train)
        bottleneck = x
        x = _Decoder(
            depth=self.depth,
            n_stages=self.n_decoder,
            ndim=self.ndim,
            top_filter=self.top_filter,
            bilinear=self.bilinear,
            norm=self.norm,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="decoder",
        )(x, skips, train)
        out = ConvHead(tuple(self.head_channel), ndim=self.ndim, dtype=self.dtype, name="conv_head")(x)
        if return_bottleneck:
            return out, bottleneck
        return out


def _unet_from_config(use_3D: bool = False, in_channels: int = 1, **kw) -> UNet:
    kw.pop("in_channels", None)
    return UNet(ndim=3 if use_3D else 2, **kw)


NETWORKS.add("UNet", _unet_from_config)
NETWORKS.add(
    "GatedUNet",
    lambda use_3D=False, in_channels=2, **kw: UNet(
        ndim=3 if use_3D else 2, gated=True,
        **{k: v for k, v in kw.items() if k not in ("in_channels",)},
    ),
)
NETWORKS.add(
    "UNet_Encoder",
    lambda use_3D=False, in_channels=1, MLP_head=(256, 128), **kw: UNetEncoder(
        ndim=3 if use_3D else 2, mlp_head=tuple(MLP_head), **kw
    ),
)
NETWORKS.add(
    "Partial_UNet",
    lambda use_3D=False, in_channels=1, head_channel=(64, 32), **kw: PartialUNet(
        ndim=3 if use_3D else 2, head_channel=tuple(head_channel), **kw
    ),
)
