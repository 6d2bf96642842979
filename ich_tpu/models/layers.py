"""Shared building blocks for the network zoo.

Layout is channels-last (NHWC / NDHWC) throughout — the native layout for
XLA:TPU convolutions. Compute dtype is configurable (bf16 for MXU-friendly
training); params and normalization statistics stay float32.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ich_tpu.ops import fastconv

Dtype = Any


class PConv(nn.Module):
    """Drop-in ``nn.Conv`` for SAME stride-1 odd-kernel convs that can
    dispatch to the lane-packed formulation (:mod:`ich_tpu.ops.fastconv`)
    when packing is enabled via ``fastconv.set_packing("on")`` (default is
    the direct conv — packing loses in-net to broken fusion; see
    docs/BENCHMARKS.md). Parameter names/shapes/init match ``nn.Conv``
    exactly, so checkpoints and ``transfer_weights`` are oblivious."""

    features: int
    kernel_size: Tuple[int, ...]
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            tuple(self.kernel_size) + (c_in, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        y = fastconv.conv_same(x, kernel)
        if bias is not None:
            y = y + bias
        return y


def normalize_p_dropout(p_dropout: Union[float, Sequence[float]], depth: int) -> Tuple[float, ...]:
    """Float → repeated per level; list → validated (reference
    ``UNet.py:47-54``)."""
    if isinstance(p_dropout, (float, int)):
        return (float(p_dropout),) * depth
    p = tuple(float(x) for x in p_dropout)
    if len(p) != depth:
        raise ValueError(f"p_dropout list length {len(p)} != depth {depth}")
    return p


class FlatGroupNorm(nn.Module):
    """GroupNorm without the channel reshape.

    ``nn.GroupNorm`` reshapes (..., C) -> (..., g, C/g) to reduce — on TPU
    that splits the 128-wide lane dimension and forces relayouts around
    every norm. Here statistics come from plain reductions: per-channel
    spatial mean / mean-of-squares (one fused pass), then a tiny (B, C)
    group aggregation, then one broadcast-normalize pass the compiler can
    fuse with the next op. Parameter names/shapes match ``nn.GroupNorm``
    (scale/bias of (C,)), and outputs agree to f32 tolerance
    (``tests/test_model_zoo.py``)."""

    num_groups: int
    epsilon: float = 1e-6  # nn.GroupNorm default
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        c = x.shape[-1]
        g = self.num_groups
        assert c % g == 0, (c, g)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        red = tuple(range(1, x.ndim - 1))  # spatial axes
        # statistics in f32 (fused into the reductions); the whole-tensor
        # normalize pass stays in the compute dtype — a f32 elementwise
        # chain here doubles every retained activation copy, which at
        # bs2 x 128³ alone overflows a v5e's HBM (round-3 probe)
        xf = x.astype(jnp.float32)
        ch_mean = jnp.mean(xf, axis=red)  # (B, C)
        ch_sq = jnp.mean(jnp.square(xf), axis=red)
        gm = jnp.mean(ch_mean.reshape(-1, g, c // g), axis=-1)  # (B, g)
        gs = jnp.mean(ch_sq.reshape(-1, g, c // g), axis=-1)
        # E[x^2] - E[x]^2 can cancel negative in f32 for near-constant
        # large-magnitude activations -> rsqrt NaN; nn.GroupNorm clamps too
        var = jnp.maximum(gs - jnp.square(gm), 0.0)
        # broadcast group stats back to channels (tiny, (B, g) -> (B, C))
        mu_c = jnp.repeat(gm, c // g, axis=-1)
        rs_c = jnp.repeat(jax.lax.rsqrt(var + self.epsilon), c // g, axis=-1)
        # fold scale/bias into one multiply-add: y = x*sc + sh
        sc = rs_c * scale[None, :]
        sh = bias[None, :] - mu_c * sc
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
        y = x * sc.astype(x.dtype).reshape(shape) + sh.astype(x.dtype).reshape(shape)
        return y.astype(self.dtype)


class Norm(nn.Module):
    """Normalization switch: BatchNorm (reference parity) or GroupNorm (the
    principled choice for small per-device batches — SURVEY §7).

    With ``axis_name`` set, BatchNorm statistics are synchronized across the
    mesh axis (``lax.pmean``) — the reference's BN stats are per-GPU and
    unsynced (SyncBatchNorm commented out, ``SNPatchGAN_scripts.py:117-119``);
    we default to synced under data parallelism and document the difference.
    """

    kind: str = "batch"  # "batch" | "group" | "none"
    group_size: int = 16
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        if self.kind == "group":
            groups = max(1, x.shape[-1] // self.group_size)
            return FlatGroupNorm(num_groups=groups, dtype=self.dtype, name="norm")(x)
        if self.kind == "none":
            return x
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
            name="norm",
        )(x)


class ConvBlock(nn.Module):
    """Double [Conv -> Norm -> ReLU] with optional trailing dropout
    (reference ``UNet.py:129-177``). Rank-agnostic: ``ndim`` selects 2D/3D.
    With ``gated=True`` each conv becomes a gated conv (feature ×
    sigmoid(gate), Yu 2019) — the reference's GatedUNet variant
    (``GatedUNet.py:121-320``) used by the attention-U-Net workload.
    """

    out_channels: int
    mid_channels: Optional[int] = None
    kernel_size: int = 3
    ndim: int = 2
    p_dropout: float = 0.0
    norm: str = "batch"
    gated: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    def _conv(self, x, ch, k, name):
        if self.gated:
            out = PConv(2 * ch, k, dtype=self.dtype, name=name)(x)
            feat, gate = jnp.split(out, 2, axis=-1)
            return feat * jax.nn.sigmoid(gate)
        return PConv(ch, k, dtype=self.dtype, name=name)(x)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        mid = self.mid_channels or self.out_channels
        k = (self.kernel_size,) * self.ndim
        # the norm runs in the block's compute dtype (statistics are still
        # f32 inside flax): a f32 norm between bf16 convs would force two
        # bf16<->f32 conversion passes per norm — pure HBM traffic.
        # (A round-3 GN prologue/epilogue conv fusion lived here, feeding a
        # hand-written implicit-GEMM kernel; the kernel measured 0.49-0.87x
        # of XLA's direct conv at every level in round 4 and the whole path
        # was removed — docs/BENCHMARKS.md "documented negative".)
        x = self._conv(x, mid, k, "conv1")
        x = Norm(self.norm, axis_name=self.axis_name, dtype=self.dtype, name="bn1")(x, train)
        x = nn.relu(x)
        x = self._conv(x, self.out_channels, k, "conv2")
        x = Norm(self.norm, axis_name=self.axis_name, dtype=self.dtype, name="bn2")(x, train)
        x = nn.relu(x)
        if self.p_dropout > 0.0:
            x = nn.Dropout(rate=self.p_dropout, deterministic=not train)(x)
        return x


def max_pool(x: jax.Array, ndim: int) -> jax.Array:
    """2x (or 2x2x2) max pooling, stride 2."""
    window = (2,) * ndim
    return nn.max_pool(x, window_shape=window, strides=window)


def _align_corners_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """(n_out, n_in) linear-interp matrix with the corner-aligned grid
    (torch ``nn.Upsample(..., align_corners=True)`` convention): output i
    samples input coordinate ``i*(n_in-1)/(n_out-1)``."""
    import numpy as np

    w = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1 or n_out == 1:
        w[:, 0] = 1.0
        return jnp.asarray(w)
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    i0 = np.clip(np.floor(src).astype(np.int64), 0, n_in - 2)
    frac = (src - i0).astype(np.float32)
    rows = np.arange(n_out)
    w[rows, i0] = 1.0 - frac
    w[rows, i0 + 1] += frac
    return jnp.asarray(w)


def upsample_linear(x: jax.Array, ndim: int, align_corners: bool = True) -> jax.Array:
    """x2 bi/trilinear upsampling of the spatial axes (channels-last).

    ``align_corners=True`` (default) reproduces the reference's
    ``nn.Upsample(scale_factor=2, mode='bi/trilinear', align_corners=True)``
    (``UNet.py:72``, ``AE_net.py:51``) exactly — implemented as one small
    constant interp matrix per axis applied as a matmul (MXU-friendly),
    since ``jax.image.resize`` only offers the half-pixel convention."""
    if not align_corners:
        new_shape = (
            x.shape[:1] + tuple(2 * s for s in x.shape[1 : 1 + ndim]) + x.shape[-1:]
        )
        return jax.image.resize(x, new_shape, method="linear")
    dtype = x.dtype
    for ax in range(1, 1 + ndim):
        n_in = x.shape[ax]
        w = _align_corners_matrix(n_in, 2 * n_in).astype(dtype)
        x = jnp.moveaxis(jnp.tensordot(w, x, axes=[[1], [ax]]), 0, ax)
    return x


class UpConv(nn.Module):
    """Transposed conv, kernel 2 stride 2 (reference's non-bilinear
    synthesis path, ``UNet.py:79-81``)."""

    out_channels: int
    ndim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = (2,) * self.ndim
        return nn.ConvTranspose(
            self.out_channels, k, strides=k, padding="VALID", dtype=self.dtype, name="convT"
        )(x)


class MLPHead(nn.Module):
    """Linear/ReLU projection head (reference ``UNet.py:179-209``).
    ``features``: sizes of each layer's output (input size inferred)."""

    features: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, f in enumerate(self.features[:-1]):
            x = nn.relu(nn.Dense(f, dtype=self.dtype, name=f"fc{i}")(x))
        return nn.Dense(self.features[-1], dtype=self.dtype, name=f"fc{len(self.features) - 1}")(x)


class ConvHead(nn.Module):
    """1x1-conv projection head (reference ``UNet.py:211-243``)."""

    features: Sequence[int]
    ndim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = (1,) * self.ndim
        for i, f in enumerate(self.features[:-1]):
            x = nn.relu(nn.Conv(f, k, dtype=self.dtype, name=f"conv{i}")(x))
        return nn.Conv(self.features[-1], k, dtype=self.dtype, name=f"conv{len(self.features) - 1}")(x)
