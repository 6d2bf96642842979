"""Supervised 2D ICH segmentation experiment: patient-level stratified
k-fold CV driver.

Behavioral mirror of ``code/scripts/unet-2D/UNet2D_scripts.py``: stratified
k-fold over patients (``:69-73``), fold idempotency via ``outputs.json``
(``:75``), negative-slice subsampling (``:121-123``), per-fold file logger
(``:77-88``), checkpoint-resume banner, per-fold artifacts (trained weights,
outputs.json, prediction bmps + CSVs), fold aggregate mean ± 1.96σ
(``:197-208``), concatenated volume CSV, config re-dump, and the analysis
PDF. Accepts the same JSON config schema (``UNet2D_config.json``).

TPU adaptations: transforms resolved through the explicit registry into an
on-device batched pipeline; datasets decoded once to dense arrays and
HBM-cached; the device is mesh-driven (no greedy GPU picking).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Callable, Optional

import numpy as np

from ich_tpu.data.segich import load_segich_2d, split_summary_table, subsample_negatives
from ich_tpu.models.unet import UNet
from ich_tpu.ops import transforms as T
from ich_tpu.train.segmentation2d import UNet2D
from ich_tpu.utils import preemption
from ich_tpu.utils.config import TRANSFORMS
from ich_tpu.utils.logging import setup_logger


def build_augment_fn(spec: dict) -> Optional[Callable]:
    if not spec:
        return None
    pipe = T.Compose(*(TRANSFORMS.build(name, **(kw or {})) for name, kw in spec.items()))
    return lambda key, imgs, masks: pipe(key, imgs, masks)


def build_unet_from_cfg(net_cfg: dict, norm: str = "batch") -> UNet:
    return UNet(
        depth=net_cfg.get("depth", 5),
        ndim=3 if net_cfg.get("3D", False) else 2,
        bilinear=net_cfg.get("bilinear", False),
        out_channels=net_cfg.get("out_channels", 1),
        top_filter=net_cfg.get("top_filter", 64),
        midchannels_factor=net_cfg.get("midchannels_factor", 2),
        p_dropout=net_cfg.get("p_dropout", 0.5),
        use_final_activation=net_cfg.get("use_final_activation", True),
        gated=net_cfg.get("gated", False),  # the adUNet2D gated-conv variant
        norm=net_cfg.get("norm", norm),
    )


def subsample_label_fraction(ids: "np.ndarray", fraction: float, rng) -> "np.ndarray":
    """Patient/volume-level label-efficiency subsampling: keep a random
    ``fraction`` of the unique ids (at least one). ONE policy shared by the
    CSV k-fold path and the in-memory sweep so results stay comparable."""
    ids = np.asarray(ids)
    keep = rng.permutation(ids)[: max(1, int(round(fraction * len(ids))))]
    return keep


def run_supervised_2d(cfg: dict, datasets_by_fold=None, init_variables=None) -> str:
    """Run the k-fold experiment; returns the experiment output dir.

    ``datasets_by_fold``: optional callable (fold_k) -> (train_ds, test_ds)
    overriding CSV loading — used by tests/synthetic runs and the
    label-efficiency sweep.
    ``init_variables``: optional pretrained variables grafted into each
    fold's trainer before training (key-intersection transfer — the
    pretrain→finetune bridge).
    """
    import pandas as pd
    from sklearn.model_selection import StratifiedKFold

    seed = cfg.get("seed", 42)
    n_fold = cfg["split"]["n_fold"]
    out_path = os.path.join(cfg["path"]["OUTPUT"], cfg["exp_name"])
    os.makedirs(out_path, exist_ok=True)

    data_dir = cfg["path"]["DATA"]
    data_info_df = patient_df = None
    if datasets_by_fold is None:
        data_info_df = pd.read_csv(os.path.join(data_dir, "ct_info.csv"), index_col=0)
        patient_df = pd.read_csv(os.path.join(data_dir, "patient_info.csv"), index_col=0)

    win = (cfg["data"]["win_center"], cfg["data"]["win_width"])
    size = cfg["data"]["size"]
    augment_fn = build_augment_fn(cfg["data"].get("augmentation", {}).get("train", {}))

    def fold_indices():
        shuffle = cfg["split"].get("shuffle", True)
        skf = StratifiedKFold(
            n_splits=n_fold, shuffle=shuffle,
            # sklearn raises if random_state is set while shuffle is off
            random_state=seed if shuffle else None,
        )
        yield from skf.split(patient_df.PatientNumber, patient_df.Hemorrhage)

    folds = fold_indices() if datasets_by_fold is None else range(n_fold)

    for k, fold in enumerate(folds):
        fold_dir = os.path.join(out_path, f"Fold_{k + 1}")
        if os.path.exists(os.path.join(fold_dir, "outputs.json")):
            continue
        os.makedirs(fold_dir, exist_ok=True)
        logger = setup_logger(os.path.join(fold_dir, "log.txt"))
        ckpt_path = os.path.join(fold_dir, "checkpoint.bin")
        if os.path.exists(ckpt_path):
            logger.info("\n" + "#" * 30 + "\n Recovering Session \n" + "#" * 30)
        logger.info("Experiment : %s", cfg["exp_name"])
        logger.info("Cross-Validation fold %02d/%02d", k + 1, n_fold)

        if datasets_by_fold is not None:
            train_ds, test_ds = datasets_by_fold(k)
        else:
            train_idx, test_idx = fold
            # skf.split returns POSITIONS -> .iloc (a patient_info.csv whose
            # first column is PatientNumber itself would make .loc silently
            # select wrong patients or KeyError)
            train_df = data_info_df[
                data_info_df.PatientNumber.isin(
                    patient_df.PatientNumber.iloc[train_idx].values
                )
            ]
            test_df = data_info_df[
                data_info_df.PatientNumber.isin(
                    patient_df.PatientNumber.iloc[test_idx].values
                )
            ]
            label_fraction = cfg["dataset"].get("label_fraction", 1.0)
            if label_fraction < 1.0:
                # label-efficiency sweep: keep a patient-level fraction
                keep = subsample_label_fraction(
                    train_df.PatientNumber.unique(), label_fraction,
                    np.random.default_rng(seed + k),
                )
                train_df = train_df[train_df.PatientNumber.isin(keep)]
            train_df = subsample_negatives(
                train_df, cfg["dataset"]["frac_negative"], seed
            )
            logger.info("\n%s", split_summary_table(data_info_df, train_df, test_df))
            train_ds = load_segich_2d(data_dir, train_df, window=win, size=size)
            test_ds = load_segich_2d(data_dir, test_df, window=win, size=size)
            logger.info("Data will be loaded from %s.", data_dir)

        net = build_unet_from_cfg(cfg["net"])
        tr = cfg["train"]
        trainer = UNet2D(
            net,
            n_epoch=tr["n_epoch"],
            batch_size=tr["batch_size"],
            lr=tr["lr"],
            lr_scheduler=tr.get("lr_scheduler", "ExponentialLR"),
            lr_scheduler_kwargs=tr.get("lr_scheduler_kwargs", {"gamma": 0.96}),
            loss_fn=tr.get("loss_fn", "BinaryDiceLoss"),
            loss_fn_kwargs=tr.get("loss_fn_kwargs", {"reduction": "mean"}),
            weight_decay=tr.get("weight_decay", 1e-6),
            augment_fn=augment_fn,
            seed=seed + k,
            print_progress=cfg.get("print_progress", False),
        )
        if tr.get("model_path_to_load"):
            trainer._ensure_state(
                train_ds.image_shape,
                max(1, int(np.ceil(len(train_ds) / tr["batch_size"]))),  # same formula as train()
            )
            from ich_tpu.train import checkpoint as ckpt_mod

            loaded = ckpt_mod.load_params(tr["model_path_to_load"], trainer._variables())
            trainer.transfer_weights(loaded, verbose=True)
        if init_variables is not None:
            trainer._ensure_state(
                train_ds.image_shape,
                max(1, int(np.ceil(len(train_ds) / tr["batch_size"]))),
            )
            trainer.transfer_weights(init_variables, verbose=True)

        # per-epoch validation re-reads the test set every epoch: HBM-cache
        # it too, or each epoch re-ships it host->device (134 MB/epoch at
        # the flagship 512-slice/256^2 fold — measured in the round-5 fold
        # wall-clock attribution)
        validate = tr.get("validate_epoch", False)
        if validate:
            test_ds = test_ds.device_cache()
        trainer.train(
            train_ds.device_cache(),
            valid_dataset=test_ds if validate else None,
            checkpoint_path=ckpt_path,
        )
        if preemption.requested():
            # the fit loop checkpointed and stopped early: do NOT evaluate
            # the undertrained model or write outputs.json (which would
            # mark the fold done forever) — the restart resumes from the
            # checkpoint left in fold_dir
            logger.warning("Preempted during fold %d: leaving checkpoint for "
                           "resume and aborting the k-fold pipeline.", k + 1)
            raise SystemExit(143)
        trainer.evaluate(test_ds, save_path=os.path.join(fold_dir, "pred"))
        trainer.save_model(os.path.join(fold_dir, "trained_unet.bin"))
        logger.info("Trained U-Net saved at %s", os.path.join(fold_dir, "trained_unet.bin"))
        trainer.save_outputs(os.path.join(fold_dir, "outputs.json"))
        logger.info("Trained statistics saved at %s", os.path.join(fold_dir, "outputs.json"))
        if os.path.exists(ckpt_path):
            os.remove(ckpt_path)
            logger.info("Checkpoint deleted.")

    # -- aggregate folds (reference :197-223) --------------------------------
    logger = logging.getLogger()
    scores = []
    for k in range(n_fold):
        with open(os.path.join(out_path, f"Fold_{k + 1}/outputs.json")) as f:
            out = json.load(f)
        scores.append([out["eval"]["dice"]["all"], out["eval"]["dice"]["positive"]])
    means = np.asarray(scores).mean(axis=0)
    ci95 = 1.96 * np.asarray(scores).std(axis=0)
    with open(os.path.join(out_path, "average_scores.txt"), "w") as f:
        f.write(f"Dice = {means[0]} +/- {ci95[0]}\n")
        f.write(f"Dice (Positive) = {means[1]} +/- {ci95[1]}\n")
    logger.info("Average Scores saved at %s", os.path.join(out_path, "average_scores.txt"))

    df_list = [
        pd.read_csv(os.path.join(out_path, f"Fold_{i + 1}/pred/volume_prediction_scores.csv"))
        for i in range(n_fold)
    ]
    pd.concat(df_list, axis=0).reset_index(drop=True).to_csv(
        os.path.join(out_path, "all_volume_prediction.csv")
    )

    with open(os.path.join(out_path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)

    try:
        from ich_tpu.postprocessing.analyse_exp import analyse_supervised_exp

        analyse_supervised_exp(
            out_path, data_dir, n_fold, save_fn=os.path.join(out_path, "results_overview.pdf")
        )
    except Exception as e:  # PDF is best-effort (needs prediction artifacts)
        logger.warning("analysis PDF skipped: %s", e)
    return out_path
