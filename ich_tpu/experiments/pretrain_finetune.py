"""Pretrain → fine-tune experiment drivers + label-efficiency sweep.

Behavioral mirrors of the reference's SSL script layer (SURVEY §2.7):
``ContextRestoration_UNet2D_scripts.py`` (SSL phase then 10-fold supervised
fine-tune via ``transfer_weights``, ``:310-312``),
``Contrastive_UNet2D_scripts.py`` (global InfoNCE → optional local InfoNCE
with frozen transferred encoder ``:214-217`` → fine-tune), and the
classification-pretraining scripts. The label-efficiency sweep (BASELINE
config 5) fine-tunes at several label fractions from one pretrained
encoder.
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Dict, Optional, Sequence

import numpy as np

from ich_tpu.data.core import LabeledSliceDataset
from ich_tpu.experiments.supervised2d import build_unet_from_cfg, run_supervised_2d
from ich_tpu.models.unet import PartialUNet, UNetEncoder
from ich_tpu.train.classifier import BinaryClassifier, MultiClassifier
from ich_tpu.train.ssl import ContextRestoration, Contrastive

logger = logging.getLogger(__name__)



def _abort_if_preempted(phase: str) -> None:
    """A preempted pretrain phase checkpointed and stopped early — the
    downstream phase must not fine-tune a half-trained encoder and write
    'complete' artifacts; exit and let the restart resume the phase."""
    from ich_tpu.utils import preemption

    if preemption.requested():
        logging.getLogger(__name__).warning(
            "Preempted during %s: leaving checkpoint for resume.", phase)
        raise SystemExit(143)


def pretrain_context_restoration(cfg: dict, dataset) -> dict:
    """Phase 1 of the CR workflow; returns the pretrained variables."""
    net_cfg = dict(cfg["net"])
    net_cfg["use_final_activation"] = False
    net = build_unet_from_cfg(net_cfg)
    tr = cfg["train"]
    cr = ContextRestoration(
        net,
        n_swap=cfg.get("corruption", {}).get("n_swap", 10),
        swap_w=cfg.get("corruption", {}).get("swap_w", (10, 30)),
        swap_h=cfg.get("corruption", {}).get("swap_h", (10, 30)),
        swap_rotate=cfg.get("corruption", {}).get("rotate", True),
        n_epoch=tr["n_epoch"], batch_size=tr["batch_size"], lr=tr["lr"],
        lr_scheduler=tr.get("lr_scheduler", "ExponentialLR"),
        lr_scheduler_kwargs=tr.get("lr_scheduler_kwargs", {"gamma": 0.95}),
        weight_decay=tr.get("weight_decay", 1e-6),
        seed=cfg.get("seed", 42),
    )
    out_dir = os.path.join(cfg["path"]["OUTPUT"], cfg["exp_name"], "pretrain")
    os.makedirs(out_dir, exist_ok=True)
    cr.train(dataset, checkpoint_path=os.path.join(out_dir, "checkpoint.bin"))
    _abort_if_preempted("context-restoration pretrain")
    try:
        labels = getattr(dataset, "labels", None)
        if labels is not None:
            labels = np.asarray(labels)
            labels = labels[:, 0] if labels.ndim > 1 else labels
        cr.evaluate_representation(dataset, labels=labels, max_samples=512)
    except Exception as e:  # t-SNE is best-effort reporting
        logger.warning("representation eval skipped: %s", e)
    cr.save_model(os.path.join(out_dir, "pretrained.bin"))
    cr.save_outputs(os.path.join(out_dir, "outputs.json"))
    return cr.get_state_dict()


def pretrain_contrastive(cfg: dict, dataset, local_dataset=None,
                         aug_pipeline=None, local_aug_pipeline=None) -> dict:
    """Global InfoNCE (+ optional local phase with frozen encoder);
    returns the pretrained variables of the last phase.

    ``aug_pipeline`` overrides the trainer's default SimCLR-style view
    pipeline for BOTH phases (at toy scale the default's brightness/
    contrast jitter is a measured NT-Xent collapse attractor — crop+flip
    views keep training in the escaping basin; docs/ROUND4_NOTES.md).
    ``local_aug_pipeline`` further overrides the local phase only — the
    reference uses milder views there (no flip, gentler crop;
    ``LocalContrastive_config.json`` ``contrastive_augmentation.local``)."""
    n = cfg["net"]
    tr = cfg["train"]
    # defaults mirror build_unet_from_cfg so a config omitting
    # top_filter/midchannels_factor still yields a transferable encoder
    enc = UNetEncoder(
        depth=n.get("depth", 5), top_filter=n.get("top_filter", 64),
        midchannels_factor=n.get("midchannels_factor", 2),
        mlp_head=tuple(n.get("MLP_head", (256, 128))),
        p_dropout=n.get("p_dropout", 0.0),
    )
    glob = Contrastive(
        enc, is_global=True, tau=cfg.get("tau", 0.5),
        aug_pipeline=aug_pipeline,
        n_epoch=tr["n_epoch"], batch_size=tr["batch_size"], lr=tr["lr"],
        lr_scheduler=tr.get("lr_scheduler", "ExponentialLR"),
        lr_scheduler_kwargs=tr.get("lr_scheduler_kwargs", {"gamma": 0.95}),
        weight_decay=tr.get("weight_decay", 1e-6), seed=cfg.get("seed", 42),
    )
    out_dir = os.path.join(cfg["path"]["OUTPUT"], cfg["exp_name"], "pretrain_global")
    os.makedirs(out_dir, exist_ok=True)
    glob.train(dataset, checkpoint_path=os.path.join(out_dir, "checkpoint.bin"))
    _abort_if_preempted("global contrastive pretrain")
    glob.save_model(os.path.join(out_dir, "pretrained.bin"))
    glob.save_outputs(os.path.join(out_dir, "outputs.json"))
    weights = glob.get_state_dict()

    if cfg.get("local", None):
        lc = cfg["local"]
        part = PartialUNet(
            depth=n.get("depth", 5), n_decoder=lc.get("n_decoder", 3),
            top_filter=n.get("top_filter", 64),
            midchannels_factor=n.get("midchannels_factor", 2),
            head_channel=tuple(lc.get("head_channel", (64, 32))),
            p_dropout=n.get("p_dropout", 0.0),
        )
        local = Contrastive(
            part, is_global=False, tau=lc.get("tau", 0.5),
            K=lc.get("K", 3), n_region=lc.get("n_region", 13),
            aug_pipeline=local_aug_pipeline or aug_pipeline,
            n_epoch=lc.get("n_epoch", tr["n_epoch"]),
            batch_size=lc.get("batch_size", tr["batch_size"]),
            lr=lc.get("lr", tr["lr"]), seed=cfg.get("seed", 42),
        )
        local.transfer_weights(weights, freeze=lc.get("freeze", True), verbose=True)
        out_dir = os.path.join(cfg["path"]["OUTPUT"], cfg["exp_name"], "pretrain_local")
        os.makedirs(out_dir, exist_ok=True)
        local.train(local_dataset or dataset,
                    checkpoint_path=os.path.join(out_dir, "checkpoint.bin"))
        _abort_if_preempted("local contrastive pretrain")
        local.save_model(os.path.join(out_dir, "pretrained.bin"))
        local.save_outputs(os.path.join(out_dir, "outputs.json"))
        weights = local.get_state_dict()
    return weights


def pretrain_classifier(cfg: dict, dataset: LabeledSliceDataset, multi: bool = False) -> dict:
    """ICH/no-ICH (or 7-way multilabel) classification pretraining of the
    U-Net encoder (reference binary/multiclass pretraining scripts)."""
    n = cfg["net"]
    tr = cfg["train"]
    n_out = 7 if multi else 2
    # defaults mirror build_unet_from_cfg (see pretrain_contrastive)
    enc = UNetEncoder(
        depth=n.get("depth", 5), top_filter=n.get("top_filter", 64),
        midchannels_factor=n.get("midchannels_factor", 2),
        mlp_head=tuple(n.get("MLP_head", (256,)) ) + (n_out,),
        p_dropout=n.get("p_dropout", 0.0),
    )
    cls = (MultiClassifier if multi else BinaryClassifier)(
        enc, n_epoch=tr["n_epoch"], batch_size=tr["batch_size"], lr=tr["lr"],
        lr_scheduler=tr.get("lr_scheduler", "ExponentialLR"),
        lr_scheduler_kwargs=tr.get("lr_scheduler_kwargs", {"gamma": 0.95}),
        weight_decay=tr.get("weight_decay", 1e-6),
        class_weight=tr.get("class_weight"), seed=cfg.get("seed", 42),
    )
    labels = np.asarray(dataset.labels)
    if not multi and labels.ndim > 1:
        dataset = LabeledSliceDataset(dataset.images, labels[:, 0].astype(np.int32))
    out_dir = os.path.join(cfg["path"]["OUTPUT"], cfg["exp_name"], "pretrain_classifier")
    os.makedirs(out_dir, exist_ok=True)
    cls.train(dataset, checkpoint_path=os.path.join(out_dir, "checkpoint.bin"))
    _abort_if_preempted("classification pretrain")
    cls.evaluate(dataset, print_to_logger=True, save_path=out_dir)
    cls.save_model(os.path.join(out_dir, "pretrained.bin"))
    cls.save_outputs(os.path.join(out_dir, "outputs.json"))
    return cls.get_state_dict()


def finetune_kfold(cfg: dict, pretrained: dict, datasets_by_fold: Callable) -> str:
    """10-fold supervised fine-tune seeded from pretrained weights (the
    reference's phase-3, ``ContextRestoration_UNet2D_scripts.py:310-312``)."""
    return run_supervised_2d_with_init(cfg, pretrained, datasets_by_fold)


def run_supervised_2d_with_init(cfg: dict, pretrained: Optional[dict], datasets_by_fold):
    """run_supervised_2d with pretrained weights grafted into each fold."""
    return run_supervised_2d(
        cfg, datasets_by_fold=datasets_by_fold, init_variables=pretrained
    )


def label_efficiency_sweep(
    cfg: dict,
    pretrained: Optional[dict],
    datasets_by_fold: Callable,
    fractions: Sequence[float] = (0.1, 0.25, 0.5, 1.0),
    seed: int = 42,
    low_label_recipe: Optional[dict] = None,
) -> Dict[float, str]:
    """Fine-tune at several label fractions (BASELINE config 5). For each
    fraction, the train split of every fold is subsampled at the *patient*
    level; evaluation uses the full test split.

    ``low_label_recipe``: optional dict ``{"below": 0.15, "frac_negative":
    0.25, "epoch_mult": 2}`` — for fractions under ``below``, cap negative
    slices at ``frac_negative`` x the positive count (the reference's
    class-rebalancing knob, ``UNet2D_scripts.py:121-123``) and stretch the
    fine-tune by ``epoch_mult``. This is the measured 10%-labels rescue
    recipe (docs/BENCHMARKS.md "10%-labels rescue probe"): the low-label
    failure basin is a class-imbalance optimization artifact, and
    rebalancing + longer training empties it."""
    results = {}
    for frac in fractions:
        sub_cfg = {
            **cfg,
            "exp_name": f"{cfg['exp_name']}_frac{int(frac * 100)}",
            "dataset": {**cfg.get("dataset", {}), "label_fraction": frac},
        }
        if low_label_recipe and frac < low_label_recipe.get("below", 0.15):
            sub_cfg["dataset"]["frac_negative"] = low_label_recipe.get(
                "frac_negative", 0.25)
            sub_cfg["train"] = {
                **cfg["train"],
                "n_epoch": int(cfg["train"]["n_epoch"]
                               * low_label_recipe.get("epoch_mult", 2)),
            }

        if datasets_by_fold is None:
            frac_folds = None  # CSV path applies label_fraction itself
        else:
            def frac_folds(k, frac=frac):
                from ich_tpu.experiments.supervised2d import subsample_label_fraction

                train_ds, test_ds = datasets_by_fold(k)
                if frac < 1.0:
                    keep = subsample_label_fraction(
                        np.unique(train_ds.vol_ids), frac,
                        np.random.default_rng(seed + k),
                    )
                    idx = np.nonzero(np.isin(train_ds.vol_ids, keep))[0]
                    train_ds = train_ds.subset(idx)
                return train_ds, test_ds

        out = run_supervised_2d_with_init(sub_cfg, pretrained, frac_folds)
        results[frac] = out
        logger.info("label fraction %.0f%% -> %s", frac * 100, out)
    return results
