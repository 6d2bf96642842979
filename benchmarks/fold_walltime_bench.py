"""Reference-scale supervised fold wall-clock (VERDICT r4 item 4; the
BASELINE "epoch time" target).

One fold of the reference's flagship workload, end to end through the real
experiment driver (``run_supervised_2d``): the ``UNet2D_config.json`` net
(depth-5 top-32, midchannels 1, BatchNorm, dropout 0.5) and recipe (Dice
p=2 α=0.2, Adam 1e-3, ExpLR γ0.96, bs16, 100 epochs, per-epoch validation
— ``UNet2D_scripts.py:69-195``), on a reference-scale synthetic set
(~2.5k slices of 256², patient-level split ~2k train / ~0.5k test; the
reference's 10-fold splits of publicSegICH with frac_negative=2 land in
the same 2-3k-slice range).

Reported attribution:
- fold wall-clock (dataset build + trainer + final eval + artifacts),
- train wall (fit loop incl. per-epoch validation + checkpoints),
- sum of per-epoch TRAIN times (parsed from the fold log; excludes
  validation — the epoch timer in ``segmentation2d.py`` wraps batches only),
- speed-of-light = measured bare step time x total steps (same net, device-
  resident batch, no host loop),
- final evaluate wall (writes per-slice bmps + CSVs like the reference).

Run on the real TPU (exclusive, ~15-25 min at 100 epochs):
    python benchmarks/fold_walltime_bench.py --epochs 100
"""

import argparse
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = 256
N_PATIENTS = 160
SLICES_PER_PATIENT = 16  # 2560 slices total; 128/32 patient split


def make_fold(seed=7):
    from ich_tpu.data.synthetic import synthetic_ich_slices

    full = synthetic_ich_slices(
        n_slices=N_PATIENTS * SLICES_PER_PATIENT, size=SIZE,
        n_volumes=N_PATIENTS, seed=seed, positive_frac=0.7,
    )
    patients = np.unique(full.vol_ids)
    test_p = patients[: len(patients) // 5]  # 32 patients -> 512 slices
    test_idx = np.nonzero(np.isin(full.vol_ids, test_p))[0]
    train_idx = np.nonzero(~np.isin(full.vol_ids, test_p))[0]
    return full.subset(train_idx), full.subset(test_idx)


def fold_cfg(out_root, n_epoch):
    """Mirror of the reference flagship ``UNet2D_config.json``."""
    return {
        "exp_name": "fold_walltime",
        "seed": 42,
        "path": {"OUTPUT": out_root, "DATA": ""},
        "split": {"n_fold": 1},
        "data": {"win_center": 50, "win_width": 200, "size": SIZE,
                 "augmentation": {"train": {
                     "Translate": {"low": -0.1, "high": 0.1},
                     "Rotate": {"low": -10, "high": 10},
                     "Scale": {"low": 0.9, "high": 1.1},
                     "HFlip": {"p": 0.5},
                 }}},
        "net": {"depth": 5, "top_filter": 32, "midchannels_factor": 1,
                "p_dropout": 0.5, "norm": "batch"},
        "train": {"n_epoch": n_epoch, "batch_size": 16, "lr": 1e-3,
                  "lr_scheduler": "ExponentialLR",
                  "lr_scheduler_kwargs": {"gamma": 0.96},
                  "weight_decay": 1e-6,
                  "loss_fn": "BinaryDiceLoss",
                  "loss_fn_kwargs": {"reduction": "mean", "p": 2, "alpha": 0.2},
                  "validate_epoch": True},
    }


def measure_sol_step(n=30):
    """Bare jitted train-step seconds (device-resident batch, no host loop)
    for the EXACT fold net — the speed-of-light unit."""
    import jax
    import jax.numpy as jnp

    from ich_tpu.experiments.supervised2d import build_augment_fn
    from ich_tpu.models.unet import UNet
    from ich_tpu.train.segmentation2d import UNet2D

    net = UNet(depth=5, ndim=2, top_filter=32, midchannels_factor=1,
               p_dropout=0.5, norm="batch", dtype=jnp.bfloat16)
    augment = build_augment_fn({
        "Translate": {"low": -0.1, "high": 0.1},
        "Rotate": {"low": -10, "high": 10},
        "Scale": {"low": 0.9, "high": 1.1},
        "HFlip": {"p": 0.5},
    })
    tr = UNet2D(net, n_epoch=1, batch_size=16, lr=1e-3,
                loss_fn="BinaryDiceLoss",
                loss_fn_kwargs={"reduction": "mean", "p": 2, "alpha": 0.2},
                augment_fn=augment)
    tr._ensure_state((SIZE, SIZE), steps_per_epoch=128)
    step = tr._make_train_step()
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(16, SIZE, SIZE)).astype(np.float32))
    masks = jnp.asarray((rng.uniform(size=(16, SIZE, SIZE)) > 0.98).astype(np.float32))
    key = jax.random.PRNGKey(0)
    st, loss = step(tr.state, imgs, masks, key)
    float(loss)  # compile + sync (scalar fetch is the axon barrier)
    t0 = time.perf_counter()
    for i in range(n):
        st, loss = step(st, imgs, masks, jax.random.fold_in(key, i))
    float(loss)
    return (time.perf_counter() - t0) / n


def parse_epoch_times(log_path):
    """Per-epoch train-batch seconds from the fold log (int-second res)."""
    times = []
    pat = re.compile(r"Train time: (\d+):(\d{2}):(\d{2})")
    with open(log_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                h, mnt, s = map(int, m.groups())
                times.append(3600 * h + 60 * mnt + s)
    return times


def main(out_root, n_epoch):
    from ich_tpu.experiments.supervised2d import run_supervised_2d

    train_ds, test_ds = make_fold()
    n_steps = int(np.ceil(len(train_ds) / 16)) * n_epoch

    t0 = time.perf_counter()
    out_dir = run_supervised_2d(
        fold_cfg(out_root, n_epoch),
        datasets_by_fold=lambda k: (train_ds, test_ds),
    )
    fold_wall = time.perf_counter() - t0

    with open(os.path.join(out_dir, "Fold_1", "outputs.json")) as f:
        outputs = json.load(f)
    epoch_times = parse_epoch_times(os.path.join(out_dir, "Fold_1", "log.txt"))
    train_wall = outputs["train"]["time"]
    eval_wall = outputs["eval"]["time"]

    sol_step = measure_sol_step()
    sol_fold = sol_step * n_steps

    train_batch_wall = float(sum(epoch_times))
    rec = {
        "metric": "supervised_fold_walltime",
        "value": round(fold_wall, 1),
        "unit": f"s/fold ({len(train_ds)} train slices 256^2, bs16, "
                f"{n_epoch} epochs, per-epoch validation, UNet2D_config net)",
        "extra": {
            "n_train": len(train_ds), "n_test": len(test_ds),
            "n_steps": n_steps,
            "epoch_s_mean": round(float(np.mean(epoch_times)), 2) if epoch_times else None,
            "epoch_s_min": float(min(epoch_times)) if epoch_times else None,
            "train_wall_s": round(train_wall, 1),
            "train_batch_wall_s": round(train_batch_wall, 1),
            "validation_ckpt_s": round(train_wall - train_batch_wall, 1),
            "final_eval_s": round(eval_wall, 1),
            "build_init_artifacts_s": round(fold_wall - train_wall - eval_wall, 1),
            "sol_step_ms": round(sol_step * 1e3, 2),
            "sol_fold_s": round(sol_fold, 1),
            "overhead_vs_sol_pct": round(100 * (fold_wall - sol_fold) / sol_fold, 1),
            "dice_positive": outputs["eval"]["dice"]["positive"],
        },
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/fold_walltime")
    ap.add_argument("--epochs", type=int, default=100)
    args = ap.parse_args()
    main(args.out, args.epochs)
