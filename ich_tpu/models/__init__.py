from ich_tpu.models.layers import ConvBlock, ConvHead, MLPHead, Norm
from ich_tpu.models.unet import PartialUNet, UNet, UNetEncoder

__all__ = [
    "ConvBlock",
    "ConvHead",
    "MLPHead",
    "Norm",
    "UNet",
    "UNetEncoder",
    "PartialUNet",
]
