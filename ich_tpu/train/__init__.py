from ich_tpu.train.state import TrainState, create_train_state, make_optimizer
from ich_tpu.train.segmentation2d import UNet2D
from ich_tpu.train.segmentation3d import UNet3D
from ich_tpu.train.ssl import ContextRestoration, Contrastive
from ich_tpu.train.classifier import BinaryClassifier, MultiClassifier
from ich_tpu.train.gan import SNPatchGAN
from ich_tpu.train.ae_trainer import AE
from ich_tpu.train.fcdd_trainer import FCDD
from ich_tpu.train.inpaint_ad import InpaintAnomalyDetector, robust_anomaly_detect
from ich_tpu.train.checkpoint import (
    load_checkpoint,
    load_params,
    save_checkpoint,
    save_params,
    transfer_weights,
)

__all__ = [
    "UNet2D",
    "UNet3D",
    "ContextRestoration",
    "Contrastive",
    "BinaryClassifier",
    "MultiClassifier",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "save_checkpoint",
    "load_checkpoint",
    "save_params",
    "load_params",
    "transfer_weights",
]
