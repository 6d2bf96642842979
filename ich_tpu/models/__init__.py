from ich_tpu.models.layers import ConvBlock, ConvHead, MLPHead, Norm
from ich_tpu.models.unet import PartialUNet, UNet, UNetEncoder
from ich_tpu.models.ae import AENet
from ich_tpu.models.resnet import (
    ResNet,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
)
from ich_tpu.models.fcdd import FCDD_CNN_VGG, receptive_upsample
from ich_tpu.models.inpainting import (
    ContextualAttention,
    GatedGenerator,
    PatchDiscriminator,
    SAGatedGenerator,
    SelfAttention,
)

__all__ = [
    "ConvBlock",
    "ConvHead",
    "MLPHead",
    "Norm",
    "UNet",
    "UNetEncoder",
    "PartialUNet",
    "AENet",
    "ResNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet152",
    "FCDD_CNN_VGG",
    "receptive_upsample",
    "GatedGenerator",
    "SAGatedGenerator",
    "PatchDiscriminator",
    "ContextualAttention",
    "SelfAttention",
]
