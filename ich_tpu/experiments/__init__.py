from ich_tpu.experiments.supervised2d import run_supervised_2d
from ich_tpu.experiments.pretrain_finetune import (
    finetune_kfold,
    label_efficiency_sweep,
    pretrain_classifier,
    pretrain_context_restoration,
    pretrain_contrastive,
    run_supervised_2d_with_init,
)

__all__ = [
    "run_supervised_2d",
    "run_supervised_2d_with_init",
    "pretrain_context_restoration",
    "pretrain_contrastive",
    "pretrain_classifier",
    "finetune_kfold",
    "label_efficiency_sweep",
]
