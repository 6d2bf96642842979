"""SN-PatchGAN inpainting networks (Yu et al. 2018/2019).

TPU redesign of the reference's
``code/src/models/networks/InpaintingNetwork.py``: gated convolutions
(``GatedConv2d:88``), two-stage coarse→refine generators with dilation
pyramid 2/4/8/16 (``GatedGenerator:469`` at ``:502-522``,
``SAGatedGenerator:697``), SAGAN self-attention (``SelfAttention:429``),
spectral-norm patch discriminator (``PatchDiscriminator:601``,
``SpectralNorm:209``) and contextual attention (``ContextualAttention:296``).

The reference's contextual attention loops over the batch in Python and
builds per-sample conv filters (``:391-423``); here the whole thing is two
batched einsums (similarity = fg-pixels × bg-patches matmul on the MXU,
reconstruction = attention × bg-patches matmul + overlap-add) — no host
loops, no dynamic filters.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ich_tpu.utils.config import NETWORKS

Dtype = Any

_ACT = {
    "relu": nn.relu,
    "lrelu": lambda x: nn.leaky_relu(x, 0.2),
    "prelu": lambda x: nn.leaky_relu(x, 0.25),
    "selu": jax.nn.selu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "none": lambda x: x,
}


def _pad_reflect(x, pad, mode="reflect"):
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode=mode)


class GatedConv2d(nn.Module):
    """Gated convolution: feature conv × sigmoid(gate conv)
    (reference ``GatedConv2d:88-158``)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    padding: int = 1
    padding_mode: str = "reflect"
    activation: str = "relu"
    batch_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _pad_reflect(x, self.padding, self.padding_mode)
        conv = nn.Conv(
            2 * self.features, (self.kernel_size,) * 2,
            strides=(self.stride,) * 2,
            kernel_dilation=(self.dilation,) * 2,
            padding="VALID", dtype=self.dtype, name="conv",
        )
        feat, gate = jnp.split(conv(x), 2, axis=-1)
        if self.batch_norm:
            feat = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name="norm"
            )(feat)
        return _ACT[self.activation](feat) * jax.nn.sigmoid(gate)


class UpsampleGatedConv2d(nn.Module):
    """Nearest ×2 upsample then gated conv (reference
    ``UpsampleGatedConv2d:159``)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    padding: int = 1
    padding_mode: str = "reflect"
    activation: str = "relu"
    batch_norm: bool = True
    scale_factor: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        x = jax.image.resize(
            x, (b, h * self.scale_factor, w * self.scale_factor, c), "nearest"
        )
        return GatedConv2d(
            features=self.features, kernel_size=self.kernel_size,
            stride=self.stride, dilation=self.dilation, padding=self.padding,
            padding_mode=self.padding_mode, activation=self.activation,
            batch_norm=self.batch_norm, dtype=self.dtype, name="gconv",
        )(x, train)


class SNConv2d(nn.Module):
    """Conv with optional spectral normalization (power iteration) and
    BatchNorm (reference ``Conv2dLayer:14`` + manual ``SpectralNorm:209``)."""

    features: int
    kernel_size: int = 5
    stride: int = 2
    padding: int = 2
    activation: str = "lrelu"
    batch_norm: bool = True
    sn: bool = True
    padding_mode: str = "constant"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mode = "reflect" if self.padding_mode == "reflect" else "constant"
        x = _pad_reflect(x, self.padding, mode)
        conv = nn.Conv(
            self.features, (self.kernel_size,) * 2, strides=(self.stride,) * 2,
            padding="VALID", dtype=self.dtype, name="conv",
        )
        if self.sn:
            conv = nn.SpectralNorm(conv, collection_name="spectral_stats")
            x = conv(x, update_stats=train)
        else:
            x = conv(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="norm")(x)
        return _ACT[self.activation](x)


class SelfAttention(nn.Module):
    """SAGAN self-attention with learned residual gate (reference
    ``SelfAttention:429-468``)."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        f = nn.Conv(c // 8, (1, 1), name="conv_f")(x).reshape(b, h * w, c // 8)
        g = nn.Conv(c // 8, (1, 1), name="conv_g")(x).reshape(b, h * w, c // 8)
        v = nn.Conv(c, (1, 1), name="conv_h")(x).reshape(b, h * w, c)
        attn = jax.nn.softmax(
            jnp.einsum("bic,bjc->bij", f, g), axis=-1
        )  # attention over keys j for each query i
        out = jnp.einsum("bij,bjc->bic", attn, v).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out + x


def _extract_patches(x: jax.Array, k: int, stride: int, dilation: int = 1) -> jax.Array:
    """(B, H, W, C) → (B, L, k, k, C) patches with torch-style SAME padding
    (the reference's unfold + same_pad, ``:317-348``)."""
    b, h, w, c = x.shape
    out_h = -(-h // stride)
    out_w = -(-w // stride)
    eff_k = (k - 1) * dilation + 1
    pad_h = max(0, (out_h - 1) * stride + eff_k - h)
    pad_w = max(0, (out_w - 1) * stride + eff_k - w)
    x = jnp.pad(
        x,
        ((0, 0), (pad_h // 2, pad_h - pad_h // 2), (pad_w // 2, pad_w - pad_w // 2), (0, 0)),
    )
    patches = jax.lax.conv_general_dilated_patches(
        x, (k, k), (stride, stride), "VALID",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, oh, ow, C*k*k) with channel-major ordering (C, kh, kw)
    oh, ow = patches.shape[1:3]
    patches = patches.reshape(b, oh * ow, c, k, k)
    return jnp.transpose(patches, (0, 1, 3, 4, 2))  # (B, L, k, k, C)


class ContextualAttention(nn.Module):
    """Yu-2018 contextual attention, fully batched (reference ``:296-427``).

    fg/bg: (B, H, W, C). Similarity of every fg pixel with every bg patch is
    one einsum (MXU matmul); softmax over patches (scaled, patch-mask
    weighted before and after, as in the reference ``:417-420``);
    reconstruction from raw-resolution bg patches with overlap-add.
    """

    kernel_size: int = 3
    patch_stride: int = 1
    compression_rate: int = 1
    softmax_scale: float = 10.0
    fuse: bool = False
    fuse_kernel: int = 3
    eps: float = 1e-9

    @nn.compact
    def __call__(self, fg, bg, mask: Optional[jax.Array] = None):
        b, in_h, in_w, c = fg.shape
        cr, ks, st = self.compression_rate, self.kernel_size, self.patch_stride
        raw_k = 2 * cr
        # raw-resolution reconstruction patches: dilation = compression_rate
        # (reference ``:357-358`` — the dilated footprint matches the
        # downsampled grid; dense extraction diverges for cr > 1)
        w_recon = _extract_patches(bg, raw_k, cr * st, dilation=cr)  # (B, L, rk, rk, C)

        # downsample fg/bg for the similarity computation
        if cr > 1:
            fg = fg[:, ::cr, ::cr, :]
            bg = bg[:, ::cr, ::cr, :]
        hh, ww = fg.shape[1:3]
        w_sim = _extract_patches(bg, ks, st)  # (B, L, k, k, C)
        L = w_sim.shape[1]

        # mask → per-patch importance (mean over the patch)
        if mask is None:
            m = jnp.ones((b, 1, L))
        else:
            if mask.ndim == 3:
                mask = mask[..., None]
            # torch F.interpolate nearest semantics: src = floor(dst*in/out)
            # (jax.image.resize uses half-pixel centers -> off-by-one vs the
            # reference when downsampling by compression_rate)
            sy = (jnp.arange(hh) * mask.shape[1]) // hh
            sx = (jnp.arange(ww) * mask.shape[2]) // ww
            mk = mask[:, sy][:, :, sx]
            mp = _extract_patches(mk, ks, st)  # (B, L, k, k, 1)
            m = jnp.mean(mp, axis=(2, 3, 4))[:, None, :]  # (B, 1, L)

        # normalize similarity patches, compute cosine-ish similarity
        w_flat = w_sim.reshape(b, L, -1)
        # reference ``:393``: eps inside the sum (adds N*eps, N = C*k*k)
        w_norm = w_flat / jnp.sqrt(
            jnp.sum(w_flat**2 + self.eps, axis=-1, keepdims=True)
        )
        fg_patch = _extract_patches(fg, ks, 1).reshape(b, hh * ww, -1)
        sim = jnp.einsum("bpd,bld->bpl", fg_patch, w_norm)  # (B, P, L)

        if self.fuse:
            # identity-kernel fusing convs over the (patch-grid, fg-grid)
            # unrolled similarity (reference :405-416) propagate attention
            # coherence along rows then columns.
            fk = self.fuse_kernel
            eye = jnp.eye(fk).reshape(fk, fk, 1, 1)
            s = sim.transpose(0, 2, 1).reshape(b, L, hh * ww, 1)

            def fuse_conv(x):
                pad = ((fk - 1) // 2, fk - 1 - (fk - 1) // 2)
                return jax.lax.conv_general_dilated(
                    x, eye, (1, 1), (pad, pad),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )

            s = fuse_conv(s)
            n_bh, n_bw = hh // st, ww // st
            s = s.reshape(b, n_bh, n_bw, hh, ww).transpose(0, 2, 1, 4, 3)
            s = s.reshape(b, L, hh * ww, 1)
            s = fuse_conv(s)
            s = s.reshape(b, n_bw, n_bh, ww, hh).transpose(0, 2, 1, 4, 3)
            sim = s.reshape(b, L, hh * ww).transpose(0, 2, 1)

        sim = sim * m  # (B, P, L) weighted by patch importance
        sim = jax.nn.softmax(sim * self.softmax_scale, axis=-1)
        sim = sim * m

        # reconstruction: attention-weighted sum of raw bg patches, then
        # overlap-add on the raw grid (stride cr, kernel raw_k)
        recon_patches = jnp.einsum(
            "bpl,bld->bpd", sim, w_recon.reshape(b, L, -1)
        ).reshape(b, hh, ww, raw_k, raw_k, c)
        out_h, out_w = hh * cr + raw_k, ww * cr + raw_k
        canvas = jnp.zeros((b, out_h, out_w, c), fg.dtype)
        for di in range(raw_k):
            for dj in range(raw_k):
                canvas = canvas.at[:, di : di + hh * cr : cr, dj : dj + ww * cr : cr, :].add(
                    recon_patches[:, :, :, di, dj, :]
                )
        canvas = canvas / (raw_k**2)
        return canvas[:, :in_h, :in_w, :]


def _coarse_layers(lat, out_ch, act, norm):
    """The shared 17-layer coarse encoder-decoder spec (reference
    ``:502-526``): stride-2 ×2 down, dilation pyramid 2/4/8/16, ×2 up ×2.
    Each spec: (features, kernel, stride, dilation, padding, act, bn, up)."""
    gc = lambda f, k=3, s=1, d=1, p=1, a=act, bn=norm: (f, k, s, d, p, a, bn, False)
    up = lambda f: (f, 3, 1, 1, 1, act, norm, True)
    return (
        gc(lat, k=5, p=2, bn=False),
        gc(2 * lat, s=2), gc(2 * lat),
        gc(4 * lat, s=2), gc(4 * lat), gc(4 * lat),
        gc(4 * lat, d=2, p=2), gc(4 * lat, d=4, p=4),
        gc(4 * lat, d=8, p=8), gc(4 * lat, d=16, p=16),
        gc(4 * lat), gc(4 * lat),
        up(2 * lat), gc(2 * lat),
        up(lat), gc(lat // 2),
        gc(out_ch, a="sigmoid", bn=False),
    )


_REMAT_WARNED = False


def _warn_remat_unvalidated_on_axon():
    """One-shot warning: remat'd gated generators are TPU-unvalidated on the
    axon platform — the remote compile helper reproducibly crashes (HTTP
    500) on the bs64 remat program, so no hardware measurement exists
    (docs/BENCHMARKS.md "GAN bs64 remat"; VERDICT r4 item 6)."""
    global _REMAT_WARNED
    if _REMAT_WARNED:
        return
    try:
        backend = jax.default_backend()
    except Exception:
        return
    if backend == "axon":
        import warnings

        warnings.warn(
            "GatedGenerator/SAGatedGenerator remat=True is TPU-unvalidated "
            "on the axon platform: the remote compile helper crashes on the "
            "large remat program (docs/BENCHMARKS.md). Measured TPU config "
            "is batch 32 with remat=False.",
            stacklevel=3,
        )
        _REMAT_WARNED = True


def _remat(cls, remat: bool, static_argnums=(2,)):
    """Optionally wrap a layer class in gradient checkpointing. ``nn.remat``
    is a lifted transform — parameter paths stay identical, so remat'd and
    plain networks share checkpoints/transfer (same convention as
    ``unet._block_cls``). ``train`` (arg 2, counting self) is static: it
    drives Python control flow (BatchNorm mode, spectral-norm updates)."""
    if not remat:
        return cls
    return nn.remat(cls, static_argnums=static_argnums)


class _GatedStack(nn.Module):
    specs: Tuple[tuple, ...]
    name_prefix: str = "g"
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (f, k, s, d, p, a, bn, up) in enumerate(self.specs):
            cls = _remat(UpsampleGatedConv2d if up else GatedConv2d, self.remat)
            x = cls(
                features=f, kernel_size=k, stride=s, dilation=d, padding=p,
                activation=a, batch_norm=bn, dtype=self.dtype,
                name=f"{self.name_prefix}{i}",
            )(x, train)
        return x


class GatedGenerator(nn.Module):
    """Two-stage gated inpainting generator with optional contextual
    attention branch (reference ``GatedGenerator:469-599``).

    ``remat=True`` (gradient-checkpointed gated convs, for big-batch
    training) is **TPU-unvalidated**: the generated XLA program is large
    enough that this image's remote compile helper crashes on it
    reproducibly (bs64; HTTP 500 — docs/BENCHMARKS.md "GAN bs64 remat"),
    so no TPU measurement exists. The measured TPU training config is
    bs32 with ``remat=False`` (527.7 ms/step, 18.9% MFU). A warning is
    emitted when the combination is instantiated on the axon platform."""

    out_channels: int = 1
    lat_channels: int = 32
    activation: str = "relu"
    norm: bool = True
    context_attention: bool = True
    return_coarse: bool = True
    context_attention_kwargs: Optional[dict] = None
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img, mask, train: bool = False):
        """img (B,H,W,C_img), mask (B,H,W,1) with 1 = region to inpaint."""
        if self.remat:
            _warn_remat_unvalidated_on_axon()
        lat, act, norm = self.lat_channels, self.activation, self.norm
        if mask.ndim == 3:
            mask = mask[..., None]
        masked = img * (1.0 - mask)
        x = jnp.concatenate([masked, mask], axis=-1)
        coarse = _GatedStack(
            tuple(_coarse_layers(lat, self.out_channels, act, norm)),
            name="coarse", remat=self.remat, dtype=self.dtype,
        )(x, train)
        coarse_corr = coarse * mask + masked

        x2 = jnp.concatenate([coarse_corr, mask], axis=-1)
        enc_specs = tuple(_coarse_layers(lat, self.out_channels, act, norm)[:10])
        feat = _GatedStack(enc_specs, name="refine_enc", remat=self.remat,
                           dtype=self.dtype)(x2, train)

        if self.context_attention:
            branch_specs = tuple(_coarse_layers(lat, self.out_channels, act, norm)[:6])
            xc = _GatedStack(branch_specs, name="refine_attn_cnn1",
                             remat=self.remat, dtype=self.dtype)(x2, train)
            # checkpointing the attention drops the (B, P, L) similarity /
            # softmax intermediates from the retained set — the largest
            # single temporary in the refine path
            xc = _remat(ContextualAttention, self.remat, static_argnums=())(
                **(self.context_attention_kwargs or {}), name="ctx"
            )(xc, xc, mask=mask)
            post = tuple((4 * lat, 3, 1, 1, 1, act, norm, False) for _ in range(2))
            xc = _GatedStack(post, name="refine_attn_cnn2", remat=self.remat,
                             dtype=self.dtype)(xc, train)
            feat = jnp.concatenate([feat, xc], axis=-1)

        dec_specs = tuple(_coarse_layers(lat, self.out_channels, act, norm)[10:])
        fine = _GatedStack(dec_specs, name="refine_dec", remat=self.remat,
                           dtype=self.dtype)(feat, train)
        if self.return_coarse:
            return fine, coarse
        return fine


class SAGatedGenerator(nn.Module):
    """Self-attention variant: the refinement path inserts SAGAN attention
    before upsampling instead of the contextual-attention branch
    (reference ``SAGatedGenerator:697-824``)."""

    out_channels: int = 1
    lat_channels: int = 32
    activation: str = "relu"
    norm: bool = True
    return_coarse: bool = True
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img, mask, train: bool = False):
        if self.remat:
            _warn_remat_unvalidated_on_axon()
        lat, act, norm = self.lat_channels, self.activation, self.norm
        if mask.ndim == 3:
            mask = mask[..., None]
        masked = img * (1.0 - mask)
        x = jnp.concatenate([masked, mask], axis=-1)
        coarse = _GatedStack(
            tuple(_coarse_layers(lat, self.out_channels, act, norm)),
            name="coarse", remat=self.remat, dtype=self.dtype,
        )(x, train)
        coarse_corr = coarse * mask + masked

        x2 = jnp.concatenate([coarse_corr, mask], axis=-1)
        # reference ``:751-766``: refine_enc is the 10 layers ENDING at the
        # dilation-16 conv; SelfAttention + ReLU sit between enc and dec,
        # and refine_dec starts with the two 4*lat convs
        enc_specs = tuple(_coarse_layers(lat, self.out_channels, act, norm)[:10])
        feat = _GatedStack(enc_specs, name="refine_enc", remat=self.remat,
                           dtype=self.dtype)(x2, train)
        feat = nn.relu(_remat(SelfAttention, self.remat, static_argnums=())(
            name="self_attention")(feat))
        dec_specs = tuple(_coarse_layers(lat, self.out_channels, act, norm)[10:])
        fine = _GatedStack(dec_specs, name="refine_dec", remat=self.remat,
                           dtype=self.dtype)(feat, train)
        if self.return_coarse:
            return fine, coarse
        return fine


class PatchDiscriminator(nn.Module):
    """Spectral-norm conv stack on cat(img, mask) with optional
    self-attention before the last layer (reference
    ``PatchDiscriminator:601-695``)."""

    out_channels: Sequence[int] = (64, 128, 256, 256, 256, 256)
    kernel_size: int = 5
    stride: int = 2
    activation: str = "lrelu"
    norm: bool = True
    sn: bool = True
    self_attention: bool = True
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img, mask, train: bool = False):
        if mask.ndim == 3:
            mask = mask[..., None]
        x = jnp.concatenate([img, mask], axis=-1)
        n = len(self.out_channels)
        for i, f in enumerate(self.out_channels):
            last = i == n - 1
            x = _remat(SNConv2d, self.remat)(
                features=f, kernel_size=self.kernel_size,
                stride=1 if i == 0 else self.stride,
                padding=(self.kernel_size - 1) // 2,
                activation="none" if last else self.activation,
                # reference keeps norm on EVERY layer incl. the last
                # (InpaintingNetwork.py:665-667); only activation drops
                batch_norm=self.norm, sn=self.sn,
                dtype=self.dtype, name=f"conv{i}",
            )(x, train)
            if self.self_attention and i == n - 2:
                # reference ``:676-677``: SelfAttention is followed by ReLU
                x = nn.relu(SelfAttention(name="self_attention")(x))
        return x


NETWORKS.add(
    "GatedGenerator",
    lambda in_channels=2, out_channels=1, lat_channels=32, device=None,
    context_attention_kwargs=None, **kw: GatedGenerator(
        out_channels=out_channels, lat_channels=lat_channels,
        context_attention_kwargs={
            k: v for k, v in (context_attention_kwargs or {}).items() if k != "device"
        } or None,
        **{k: v for k, v in kw.items() if k in (
            "activation", "norm", "context_attention", "return_coarse", "remat")},
    ),
)
NETWORKS.add(
    "SAGatedGenerator",
    lambda in_channels=2, out_channels=1, lat_channels=32, device=None, **kw: SAGatedGenerator(
        out_channels=out_channels, lat_channels=lat_channels,
        **{k: v for k, v in kw.items() if k in (
            "activation", "norm", "return_coarse", "remat")},
    ),
)
NETWORKS.add(
    "PatchDiscriminator",
    lambda in_channels=2, device=None, **kw: PatchDiscriminator(
        **{k: v for k, v in kw.items() if k in (
            "out_channels", "kernel_size", "stride", "activation", "norm",
            "sn", "self_attention", "remat")},
    ),
)
