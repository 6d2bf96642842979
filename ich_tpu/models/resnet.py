"""ResNet family (slice-triage classifier and AD gate).

Reference ``code/src/models/networks/ResNet.py``: from-scratch
ResNet-18/34/50/101/152 with a configurable number of input channels
(``BasicBlock:13``, ``Bottleneck:66``, ``ResNet:122``, factories
``:192-209``). Channels-last flax implementation.
"""

from __future__ import annotations

from typing import Any, Sequence, Type

import flax.linen as nn
import jax.numpy as jnp

from ich_tpu.utils.config import NETWORKS

Dtype = Any


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9, name=name)
        # explicit (1,1) padding: torch-symmetric windows for stride 2
        # (XLA SAME pads (0,1) there — different alignment)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = bn("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=self.dtype, name="down_conv")(x)
            x = bn("down_bn")(x)
        return nn.relu(x + y)


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9, name=name)
        out_ch = self.features * self.expansion
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = bn("bn3")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            x = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=self.dtype, name="down_conv")(x)
            x = bn("down_bn")(x)
        return nn.relu(x + y)


class ResNet(nn.Module):
    block: Type[nn.Module]
    stage_sizes: Sequence[int]
    num_classes: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        # torch-symmetric paddings (ResNet.py:141-145: k7 s2 p3 stem, k3 s2
        # p1 maxpool); XLA SAME would shift stride-2 window centers by one
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name="stem_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for s, n_blocks in enumerate(self.stage_sizes):
            for b in range(n_blocks):
                stride = 2 if s > 0 and b == 0 else 1
                x = self.block(
                    features=64 * 2**s, stride=stride, dtype=self.dtype,
                    name=f"stage{s}_block{b}",
                )(x, train)
        feats = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(feats)
        if return_features:
            return logits, feats
        return logits


def resnet18(num_classes=2, **kw):
    return ResNet(BasicBlock, (2, 2, 2, 2), num_classes=num_classes, **kw)


def resnet34(num_classes=2, **kw):
    return ResNet(BasicBlock, (3, 4, 6, 3), num_classes=num_classes, **kw)


def resnet50(num_classes=2, **kw):
    return ResNet(Bottleneck, (3, 4, 6, 3), num_classes=num_classes, **kw)


def resnet101(num_classes=2, **kw):
    return ResNet(Bottleneck, (3, 4, 23, 3), num_classes=num_classes, **kw)


def resnet152(num_classes=2, **kw):
    return ResNet(Bottleneck, (3, 8, 36, 3), num_classes=num_classes, **kw)


for _name, _fn in [("ResNet18", resnet18), ("ResNet34", resnet34),
                   ("ResNet50", resnet50), ("ResNet101", resnet101),
                   ("ResNet152", resnet152)]:
    NETWORKS.add(
        _name,
        (lambda fn: lambda num_classes=2, input_channels=1, **kw: fn(num_classes=num_classes))(_fn),
    )
