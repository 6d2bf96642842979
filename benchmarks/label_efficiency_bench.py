"""Label-efficiency benchmark: scratch vs context-restoration pretraining
at 10/25/50/100% labels, >=5-fold CV (VERDICT r1 item 3; BASELINE config 5).

The synthetic task is deliberately *hard at low labels*: low-contrast
lesions (intensity 0.48 vs tissue 0.35) over smooth per-patient texture —
structure the context-restoration pretext learns from unlabeled data, so
pretraining has real signal to transfer (mirrors the reference workflow
``ContextRestoration_UNet2D_scripts.py:310-312``).

Both arms share folds and seeds, so the per-(fold, fraction) Dice deltas
are PAIRED; alongside the reference's fold-aggregate mean ± 1.96σ
convention (``UNet2D_scripts.py:203-207``) we report the 95% CI of the
mean paired delta — the statistically meaningful test.

Run on the TPU (takes ~30-60 min):
    python benchmarks/label_efficiency_bench.py --out /tmp/le_bench

Writes results.json, a markdown table, and a curve_std figure.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRACTIONS = (0.1, 0.25, 0.5, 1.0)
N_FOLDS = 5
N_PATIENTS = 20
SLICES_PER_PATIENT = 8
SIZE = 64
HARD = dict(lesion_intensity=0.48, lesion_noise=0.06, texture_amp=0.12)


def make_datasets(seed=7):
    from ich_tpu.data.synthetic import synthetic_ich_slices

    labeled = synthetic_ich_slices(
        n_slices=N_PATIENTS * SLICES_PER_PATIENT, size=SIZE,
        n_volumes=N_PATIENTS, seed=seed, positive_frac=0.7, **HARD,
    )
    unlabeled = synthetic_ich_slices(
        n_slices=768, size=SIZE, n_volumes=96, seed=seed + 1,
        positive_frac=0.5, **HARD,
    )
    return labeled, unlabeled


def folds_fn(labeled, n_folds=N_FOLDS):
    """Patient-level k-fold splits shared by both arms."""
    patients = np.unique(labeled.vol_ids)
    rng = np.random.default_rng(123)
    perm = rng.permutation(patients)
    chunks = np.array_split(perm, n_folds)

    def by_fold(k):
        test_p = chunks[k]
        test_idx = np.nonzero(np.isin(labeled.vol_ids, test_p))[0]
        train_idx = np.nonzero(~np.isin(labeled.vol_ids, test_p))[0]
        return labeled.subset(train_idx), labeled.subset(test_idx)

    return by_fold


def base_cfg(out_root, name):
    return {
        "exp_name": name,
        "seed": 42,
        "path": {"OUTPUT": out_root, "DATA": ""},
        "split": {"n_fold": N_FOLDS},
        "data": {"win_center": 50, "win_width": 200, "size": SIZE,
                 "augmentation": {"train": {
                     "Translate": {"low": -0.1, "high": 0.1},
                     "Rotate": {"low": -10, "high": 10},
                     "HFlip": {"p": 0.5},
                 }}},
        "net": {"depth": 4, "top_filter": 16, "midchannels_factor": 1,
                "p_dropout": 0.1, "norm": "batch"},
        "train": {"n_epoch": 40, "batch_size": 16, "lr": 1e-3,
                  "lr_scheduler": "ExponentialLR",
                  "lr_scheduler_kwargs": {"gamma": 0.95},
                  "loss_fn": "BinaryDiceLoss",
                  "loss_fn_kwargs": {"alpha": 0.2, "reduction": "mean"}},
    }


def collect_dice(exp_dir, n_folds=N_FOLDS):
    vals = []
    for k in range(n_folds):
        with open(os.path.join(exp_dir, f"Fold_{k + 1}", "outputs.json")) as f:
            out = json.load(f)
        vals.append(float(out["eval"]["dice"]["positive"]))
    return np.asarray(vals)


def main(out_root, seed=42):
    """One full two-arm sweep at training seed ``seed``. Fold splits stay
    fixed (both arms and all seeds see identical splits, so per-(fold,seed)
    Dice deltas are paired); the seed varies init/shuffle/augmentation —
    run several seeds and pool with --report-only over the parent dir."""
    from ich_tpu.experiments.pretrain_finetune import (
        label_efficiency_sweep,
        pretrain_context_restoration,
    )

    os.makedirs(out_root, exist_ok=True)
    labeled, unlabeled = make_datasets()
    by_fold = folds_fn(labeled)

    pre_cfg = base_cfg(out_root, "cr_pretrain")
    pre_cfg["seed"] = seed
    pre_cfg["train"] = {**pre_cfg["train"], "n_epoch": 30, "batch_size": 32}
    pre_cfg["corruption"] = {"n_swap": 10, "swap_w": (6, 14), "swap_h": (6, 14),
                             "rotate": True}
    weights = pretrain_context_restoration(pre_cfg, unlabeled)

    results = {}
    for arm, init in (("scratch", None), ("pretrained", weights)):
        cfg = base_cfg(out_root, arm)
        cfg["seed"] = seed
        dirs = label_efficiency_sweep(cfg, init, by_fold, fractions=FRACTIONS,
                                      seed=seed)
        results[arm] = {
            str(frac): collect_dice(d).tolist() for frac, d in dirs.items()
        }

    with open(os.path.join(out_root, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    report(results, out_root)


def pooled_report(parent_dir, out_root=None):
    """Pool per-(fold, seed) results from every ``results.json`` found under
    ``parent_dir`` (one subdir per seed) into a single paired table."""
    import glob

    pooled = {"scratch": {}, "pretrained": {}}
    files = sorted(glob.glob(os.path.join(parent_dir, "*", "results.json")))
    if not files:
        files = [os.path.join(parent_dir, "results.json")]
    for fn in files:
        with open(fn) as f:
            res = json.load(f)
        for arm in pooled:
            for frac, vals in res[arm].items():
                pooled[arm].setdefault(frac, []).extend(vals)
    print(f"pooled {len(files)} runs")
    report(pooled, out_root or parent_dir)
    return pooled


def report(results, out_root):
    lines = ["| labels | scratch (±1.96σ) | CR-pretrained (±1.96σ) | paired Δ [95% CI] |",
             "|---|---|---|---|"]
    for frac in FRACTIONS:
        if str(frac) not in results["scratch"]:
            continue
        s = np.asarray(results["scratch"][str(frac)])
        p = np.asarray(results["pretrained"][str(frac)])
        d = p - s
        ci = 1.96 * d.std(ddof=1) / np.sqrt(len(d))
        lines.append(
            f"| {int(frac * 100)}% | {s.mean():.3f} ± {1.96 * s.std(ddof=1):.3f} "
            f"| {p.mean():.3f} ± {1.96 * p.std(ddof=1):.3f} "
            f"| {d.mean():+.3f} [{d.mean() - ci:+.3f}, {d.mean() + ci:+.3f}] |"
        )
    table = "\n".join(lines)
    print(table)
    with open(os.path.join(out_root, "table.md"), "w") as f:
        f.write(table + "\n")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from ich_tpu.postprocessing.plots import curve_std

        fracs = [f for f in FRACTIONS if str(f) in results["scratch"]]
        fig, ax = plt.subplots(figsize=(5, 4))
        xs = np.asarray(fracs) * 100
        series = []
        for arm in ("scratch", "pretrained"):
            cols = np.stack([np.asarray(results[arm][str(f)]) for f in fracs])
            series.append(np.concatenate([xs[:, None], cols], axis=1))
        curve_std(series, ["scratch", "CR-pretrained"], ax=ax)
        ax.set_xlabel("% of labeled patients")
        ax.set_ylabel("volumetric Dice (ICH-positive)")
        fig.tight_layout()
        fig.savefig(os.path.join(out_root, "label_efficiency.png"), dpi=150)
    except Exception as e:  # figure is best-effort
        print(f"figure skipped: {e}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/le_bench")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--report-only", action="store_true",
                    help="re-render table/figure from existing results.json "
                         "(pools every */results.json under --out)")
    args = ap.parse_args()
    if args.report_only:
        pooled_report(args.out)
    else:
        main(args.out, seed=args.seed)
