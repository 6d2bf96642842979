"""Convert reference torch ``state_dict``s to ich_tpu flax variables.

The reference's networks (``/root/reference/code/src/models/networks/``)
are plain torch modules; a user migrating to ich_tpu can load a trained
checkpoint, pass ``{k: v.numpy() for k, v in sd.items()}`` to the matching
``port_*`` function here, and get ``{"params": ..., "batch_stats": ...}``
for the equivalent flax module.

Layout conventions converted:
  - conv kernels: torch OIHW / OIDHW -> flax HWIO / DHWIO
  - transposed-conv kernels: torch (I, O, *k) -> flax (*k, I, O) with the
    spatial axes flipped (flax ``ConvTranspose`` with the default
    ``transpose_kernel=False`` correlates, torch computes the conv adjoint)
  - linear weights: torch (O, I) -> flax (I, O)
  - BatchNorm: weight/bias -> scale/bias params; running stats ->
    ``batch_stats`` collection.

No torch import here — inputs are numpy mappings.
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence, Tuple

import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Array]


def conv_kernel(w: Array) -> Array:
    """torch conv weight OI*k -> flax *kIO (2D or 3D)."""
    nsp = w.ndim - 2
    return np.ascontiguousarray(np.transpose(w, tuple(range(2, 2 + nsp)) + (1, 0)))


def convt_kernel(w: Array) -> Array:
    """torch ConvTranspose weight (I, O, *k) -> flax (*k, I, O), spatially
    flipped (verified against torch numerically; see module docstring)."""
    nsp = w.ndim - 2
    k = np.transpose(w, tuple(range(2, 2 + nsp)) + (0, 1))
    return np.ascontiguousarray(np.flip(k, axis=tuple(range(nsp))))


def dense_kernel(w: Array) -> Array:
    return np.ascontiguousarray(w.T)


def _set(tree: Dict, path: str, value: Array) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)


class _Builder:
    """Accumulates params/batch_stats entries by flax path."""

    def __init__(self, sd: StateDict):
        self.sd = dict(sd)
        self.params: Dict = {}
        self.stats: Dict = {}

    def conv(self, tname: str, fpath: str, transpose=conv_kernel) -> None:
        _set(self.params, f"{fpath}/kernel", transpose(self.sd[f"{tname}.weight"]))
        if f"{tname}.bias" in self.sd:
            _set(self.params, f"{fpath}/bias", self.sd[f"{tname}.bias"])

    def convt(self, tname: str, fpath: str) -> None:
        self.conv(tname, fpath, transpose=convt_kernel)

    def dense(self, tname: str, fpath: str) -> None:
        _set(self.params, f"{fpath}/kernel", dense_kernel(self.sd[f"{tname}.weight"]))
        if f"{tname}.bias" in self.sd:
            _set(self.params, f"{fpath}/bias", self.sd[f"{tname}.bias"])

    def bn(self, tname: str, fpath: str) -> None:
        _set(self.params, f"{fpath}/scale", self.sd[f"{tname}.weight"])
        _set(self.params, f"{fpath}/bias", self.sd[f"{tname}.bias"])
        _set(self.stats, f"{fpath}/mean", self.sd[f"{tname}.running_mean"])
        _set(self.stats, f"{fpath}/var", self.sd[f"{tname}.running_var"])

    def variables(self) -> Dict:
        return {"params": self.params, "batch_stats": self.stats}


def _conv_block(b: _Builder, tprefix: str, fprefix: str) -> None:
    """Reference ``ConvBlock`` (UNet.py:129-177) -> ich_tpu ``ConvBlock``
    (conv1/bn1/conv2/bn2, norm nested under bn*/norm)."""
    b.conv(f"{tprefix}.conv1", f"{fprefix}/conv1")
    b.bn(f"{tprefix}.bn1", f"{fprefix}/bn1/norm")
    b.conv(f"{tprefix}.conv2", f"{fprefix}/conv2")
    b.bn(f"{tprefix}.bn2", f"{fprefix}/bn2/norm")


def _count_blocks(sd: StateDict, prefix: str) -> int:
    n = 0
    while f"{prefix}.{n}.conv1.weight" in sd:
        n += 1
    return n


def port_unet(sd: StateDict, bilinear: bool = False) -> Dict:
    """Reference ``UNet`` (UNet.py:18-127) -> :class:`ich_tpu.models.UNet`
    variables. Depth and 2D/3D are inferred from the state dict."""
    b = _Builder(sd)
    n_down = _count_blocks(sd, "down_block")
    for i in range(n_down):
        _conv_block(b, f"down_block.{i}", f"encoder/down_{i}")
    _conv_block(b, "bottleneck_block", "encoder/bottleneck")
    for i in range(n_down):
        if not bilinear and f"up_samp.{i}.weight" in sd:
            b.convt(f"up_samp.{i}", f"decoder/up_samp_{i}/convT")
        _conv_block(b, f"up_block.{i}", f"decoder/up_{i}")
    b.conv("final_conv", "final_conv")
    return b.variables()


def port_unet_encoder(sd: StateDict) -> Dict:
    """Reference ``UNet_Encoder`` (UNet.py:245-326) ->
    :class:`ich_tpu.models.UNetEncoder` variables."""
    b = _Builder(sd)
    for i in range(_count_blocks(sd, "down_block")):
        _conv_block(b, f"down_block.{i}", f"encoder/down_{i}")
    _conv_block(b, "bottleneck_block", "encoder/bottleneck")
    i = 0
    while f"mlp_head.fc_layers.{i}.weight" in sd:
        b.dense(f"mlp_head.fc_layers.{i}", f"mlp_head/fc{i}")
        i += 1
    return b.variables()


def port_partial_unet(sd: StateDict, bilinear: bool = False) -> Dict:
    """Reference ``Partial_UNet`` (UNet.py:328-435) ->
    :class:`ich_tpu.models.PartialUNet` variables."""
    b = _Builder(sd)
    for i in range(_count_blocks(sd, "down_block")):
        _conv_block(b, f"down_block.{i}", f"encoder/down_{i}")
    _conv_block(b, "bottleneck_block", "encoder/bottleneck")
    for i in range(_count_blocks(sd, "up_block")):
        if not bilinear and f"up_samp.{i}.weight" in sd:
            b.convt(f"up_samp.{i}", f"decoder/up_samp_{i}/convT")
        _conv_block(b, f"up_block.{i}", f"decoder/up_{i}")
    i = 0
    while f"final_conv.conv_layers.{i}.weight" in sd:
        b.conv(f"final_conv.conv_layers.{i}", f"conv_head/conv{i}")
        i += 1
    return b.variables()


def port_ae(sd: StateDict, bilinear: bool = False) -> Dict:
    """Reference ``AE_net`` (AE_net.py:77-106) ->
    :class:`ich_tpu.models.AENet` variables."""
    b = _Builder(sd)
    b.conv("encoder.in_conv.0", "encoder/in_conv")
    b.bn("encoder.in_conv.1", "encoder/in_bn")
    i = 0
    while f"encoder.conv_list.{i}.0.weight" in sd:
        b.conv(f"encoder.conv_list.{i}.0", f"encoder/conv{i}")
        b.bn(f"encoder.conv_list.{i}.1", f"encoder/bn{i}")
        i += 1
    b.conv("encoder.bottelneck_conv.0", "encoder/bottleneck_conv")
    b.bn("encoder.bottelneck_conv.1", "encoder/bottleneck_bn")
    # decoder: bilinear -> Sequential(Upsample, Conv, BN); else (ConvT, BN)
    ci, bi = (1, 2) if bilinear else (0, 1)
    dec_t = b.conv if bilinear else b.convt
    dec_t(f"decoder.bottelneck_conv.{ci}", "decoder/bottleneck_convT")
    b.bn(f"decoder.bottelneck_conv.{bi}", "decoder/bottleneck_bn")
    i = 0
    while f"decoder.conv_list.{i}.{ci}.weight" in sd:
        dec_t(f"decoder.conv_list.{i}.{ci}", f"decoder/convT{i}")
        b.bn(f"decoder.conv_list.{i}.{bi}", f"decoder/bn{i}")
        i += 1
    b.conv("decoder.out_conv.0", "decoder/out_conv")
    b.bn("decoder.out_conv.1", "decoder/out_bn")
    return b.variables()


def port_resnet(sd: StateDict, stage_sizes: Sequence[int]) -> Dict:
    """Reference ``ResNet`` (ResNet.py:122-190) ->
    :class:`ich_tpu.models.resnet.ResNet` variables. ``stage_sizes`` e.g.
    (2, 2, 2, 2) for ResNet-18, (3, 4, 6, 3) for ResNet-50."""
    b = _Builder(sd)
    b.conv("conv1", "stem_conv")
    b.bn("bn1", "stem_bn")
    bottleneck = "layer1.0.conv3.weight" in sd
    for s, n_blocks in enumerate(stage_sizes):
        for blk in range(n_blocks):
            t = f"layer{s + 1}.{blk}"
            f = f"stage{s}_block{blk}"
            b.conv(f"{t}.conv1", f"{f}/conv1")
            b.bn(f"{t}.bn1", f"{f}/bn1")
            b.conv(f"{t}.conv2", f"{f}/conv2")
            b.bn(f"{t}.bn2", f"{f}/bn2")
            if bottleneck:
                b.conv(f"{t}.conv3", f"{f}/conv3")
                b.bn(f"{t}.bn3", f"{f}/bn3")
            if f"{t}.shortcut.0.weight" in sd:
                b.conv(f"{t}.shortcut.0", f"{f}/down_conv")
                b.bn(f"{t}.shortcut.1", f"{f}/down_bn")
    b.dense("linear", "fc")
    return b.variables()


# FCDD_CNN_VGG feature indices of (conv, bn) pairs in the torch Sequential
# (FCDD_net.py:15-37: relu/maxpool layers hold no parameters)
_FCDD_CONV_IDX: Tuple[int, ...] = (0, 4, 8, 11, 15, 18)


def port_fcdd(sd: StateDict) -> Dict:
    """Reference ``FCDD_CNN_VGG`` (FCDD_net.py:9-47) ->
    :class:`ich_tpu.models.FCDD_CNN_VGG` variables."""
    b = _Builder(sd)
    for i, idx in enumerate(_FCDD_CONV_IDX):
        b.conv(f"features.{idx}", f"conv{i}")
        b.bn(f"features.{idx + 1}", f"bn{i}")
    b.conv("conv_final", "conv_final")
    return b.variables()


def _gated_conv(b: _Builder, tprefix: str, fpath: str) -> None:
    """Reference ``GatedConv2d`` (InpaintingNetwork.py:88-158: separate
    feat/gate convs) -> ich_tpu fused 2F-channel conv (feat half first,
    matching the ``jnp.split`` order)."""
    wf = conv_kernel(b.sd[f"{tprefix}.conv_feat.weight"])
    wg = conv_kernel(b.sd[f"{tprefix}.conv_gate.weight"])
    _set(b.params, f"{fpath}/conv/kernel", np.concatenate([wf, wg], axis=-1))
    if f"{tprefix}.conv_feat.bias" in b.sd:
        _set(
            b.params,
            f"{fpath}/conv/bias",
            np.concatenate(
                [b.sd[f"{tprefix}.conv_feat.bias"], b.sd[f"{tprefix}.conv_gate.bias"]]
            ),
        )
    if f"{tprefix}.norm.weight" in b.sd:
        b.bn(f"{tprefix}.norm", f"{fpath}/norm")


def _gated_stack(b: _Builder, tprefix: str, fprefix: str, n: int) -> None:
    for i in range(n):
        if f"{tprefix}.{i}.gated_conv.conv_feat.weight" in b.sd:  # upsample block
            _gated_conv(b, f"{tprefix}.{i}.gated_conv", f"{fprefix}/g{i}/gconv")
        else:
            _gated_conv(b, f"{tprefix}.{i}", f"{fprefix}/g{i}")


def port_gated_generator(sd: StateDict, context_attention: bool = True) -> Dict:
    """Reference ``GatedGenerator`` (InpaintingNetwork.py:469-599) ->
    :class:`ich_tpu.models.GatedGenerator` variables. ``ContextualAttention``
    holds no parameters."""
    b = _Builder(sd)
    _gated_stack(b, "coarse", "coarse", 17)
    _gated_stack(b, "refine_enc", "refine_enc", 10)
    if context_attention:
        _gated_stack(b, "refine_attention_enc.cnn1", "refine_attn_cnn1", 6)
        _gated_stack(b, "refine_attention_enc.cnn2", "refine_attn_cnn2", 2)
    _gated_stack(b, "refine_dec", "refine_dec", 7)
    return b.variables()


def _self_attention(b: _Builder, tprefix: str, fprefix: str) -> None:
    """Reference ``SelfAttention`` (InpaintingNetwork.py:429-468) -> flax
    :class:`ich_tpu.models.inpainting.SelfAttention` params."""
    for name in ("conv_f", "conv_g", "conv_h"):
        b.conv(f"{tprefix}.{name}", f"{fprefix}/{name}")
    _set(b.params, f"{fprefix}/gamma", b.sd[f"{tprefix}.gamma"])


def port_sa_gated_generator(sd: StateDict) -> Dict:
    """Reference ``SAGatedGenerator`` (InpaintingNetwork.py:697-824) ->
    :class:`ich_tpu.models.SAGatedGenerator` variables: coarse 17,
    refine_enc 10 (ends at the dilation-16 conv), SelfAttention(+ReLU),
    refine_dec 7."""
    b = _Builder(sd)
    _gated_stack(b, "coarse", "coarse", 17)
    _gated_stack(b, "refine_enc", "refine_enc", 10)
    _self_attention(b, "refine_attention.0", "self_attention")
    _gated_stack(b, "refine_dec", "refine_dec", 7)
    return b.variables()


def port_patch_discriminator(sd: StateDict, n_layers: int = 6,
                             self_attention: bool = True) -> Dict:
    """Reference ``PatchDiscriminator`` (InpaintingNetwork.py:601-695,
    sn=False) -> :class:`ich_tpu.models.PatchDiscriminator` variables. The
    reference interleaves SelfAttention+ReLU as extra layer_list entries
    after index n-2, shifting the last conv's index by 2."""
    b = _Builder(sd)
    for i in range(n_layers):
        ti = i if not (self_attention and i == n_layers - 1) else i + 2
        b.conv(f"layer_list.{ti}.conv", f"conv{i}/conv")
        if f"layer_list.{ti}.norm.weight" in b.sd:
            b.bn(f"layer_list.{ti}.norm", f"conv{i}/norm")
    if self_attention:
        _self_attention(b, f"layer_list.{n_layers - 1}", "self_attention")
    return b.variables()
