"""Label-efficiency benchmark: scratch vs context-restoration vs global
contrastive pretraining at 10/25/50/100% labels, >=5-fold CV (VERDICT r1
item 3 + r3 item 4; BASELINE config 5 names *contrastive* pretraining —
``Contrastive_UNet2D_scripts.py:38-242`` — and it is the
``scripts/label_efficiency.py`` CLI default, so it gets the same paired
statistics as the CR arm).

The synthetic task is deliberately *hard at low labels*: low-contrast
lesions (intensity 0.48 vs tissue 0.35) over smooth per-patient texture —
structure the context-restoration pretext learns from unlabeled data, so
pretraining has real signal to transfer (mirrors the reference workflow
``ContextRestoration_UNet2D_scripts.py:310-312``).

Both arms share folds and seeds, so the per-(fold, fraction) Dice deltas
are PAIRED; alongside the reference's fold-aggregate mean ± 1.96σ
convention (``UNet2D_scripts.py:203-207``) we report the 95% CI of the
mean paired delta — the statistically meaningful test.

Run on the TPU (takes ~30-90 min):
    python benchmarks/label_efficiency_bench.py --out /tmp/le_bench

``--rescue`` runs the 10%-labels rescue probe instead (VERDICT r3 item 5):
fraction 0.1 only, with the reference's ``frac_negative`` negative-slice
subsampling analog (``UNet2D_scripts.py:121-123``) plus a longer
fine-tune — asking whether the predict-empty basin at 10% labels is an
optimization artifact or a data floor.

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


def _pretrain_cr(out_root, seed, unlabeled):
    from ich_tpu.experiments.pretrain_finetune import pretrain_context_restoration

    pre_cfg = base_cfg(out_root, "cr_pretrain")
    pre_cfg["seed"] = seed
    pre_cfg["train"] = {**pre_cfg["train"], "n_epoch": 30, "batch_size": 32}
    pre_cfg["corruption"] = {"n_swap": 10, "swap_w": (6, 14), "swap_h": (6, 14),
                             "rotate": True}
    return pretrain_context_restoration(pre_cfg, unlabeled)


def _contrastive_cfg(out_root, seed, name):
    pre_cfg = base_cfg(out_root, name)
    pre_cfg["seed"] = seed
    pre_cfg["net"] = {**pre_cfg["net"], "MLP_head": (256, 128)}
    pre_cfg["train"] = {**pre_cfg["train"], "n_epoch": 30, "batch_size": 32}
    return pre_cfg


def _global_views():
    from ich_tpu.ops import transforms as T

    # Crop+flip+blur views: the trainer's default brightness/contrast
    # jitter is a measured NT-Xent collapse attractor at this toy scale
    # (embeddings collapse, loss pins at ln(2B-1); docs/ROUND4_NOTES.md) —
    # geometric views keep both this framework and the reference's own
    # torch trainer in the escaping basin.
    return T.Compose(T.RandomCropResize((0.4, 0.8)), T.HFlip(0.5),
                     T.GaussianBlur(0.5, (0.1, 2.0)))


def _pretrain_contrastive(out_root, seed, unlabeled):
    from ich_tpu.experiments.pretrain_finetune import pretrain_contrastive

    pre_cfg = _contrastive_cfg(out_root, seed, "contrastive_pretrain")
    return pretrain_contrastive(pre_cfg, unlabeled, aug_pipeline=_global_views())


def _pretrain_contrastive_local(out_root, seed, unlabeled):
    """Global InfoNCE followed by the reference's LOCAL contrastive phase
    (Chaitanya 2020: Partial_UNet with the transferred encoder frozen,
    region NT-Xent on partial-decoder feature maps;
    ``Contrastive_UNet2D_scripts.py:178-242``, ``LocalContrastive_config.
    json`` SSL.local: depth 5 / n_decoder 3 / K 3 / freeze true). Scaled to
    the bench net (depth 4 → n_decoder 2, i.e. one stage short of the full
    decoder like the reference; head (64, 32) halves the reference's
    (128, 32) as top_filter 16 halves its 32). The global phase config is
    IDENTICAL to the ``contrastive`` arm's, so at a given seed the two arms
    share global weights and the comparison isolates the local phase."""
    from ich_tpu.experiments.pretrain_finetune import pretrain_contrastive
    from ich_tpu.ops import transforms as T

    pre_cfg = _contrastive_cfg(out_root, seed, "contrastive_local_pretrain")
    pre_cfg["local"] = {"n_decoder": 2, "head_channel": (64, 32), "K": 3,
                        "n_region": 13, "n_epoch": 30, "batch_size": 32,
                        "freeze": True}
    # Reference local views are milder (crop 0.7-1.0 + blur + contrast
    # jitter); we mirror them minus the contrast jitter (the measured
    # collapse attractor at this toy scale — see _global_views).
    local_views = T.Compose(T.RandomCropResize((0.7, 1.0)),
                            T.GaussianBlur(0.5, (0.1, 1.5)))
    return pretrain_contrastive(pre_cfg, unlabeled,
                                aug_pipeline=_global_views(),
                                local_aug_pipeline=local_views)


PRETRAINERS = {"pretrained": _pretrain_cr, "contrastive": _pretrain_contrastive,
               "contrastive_local": _pretrain_contrastive_local}


def subsample_negative_slices(ds, frac_negative, rng):
    """Reference ``UNet2D_scripts.py:121-123`` analog: keep every
    ICH-positive slice and a ``frac_negative`` fraction of the negatives."""
    pos = np.asarray(ds.masks).reshape(len(ds), -1).sum(axis=1) > 0
    neg_idx = np.nonzero(~pos)[0]
    keep_neg = rng.choice(neg_idx, int(round(frac_negative * len(neg_idx))),
                          replace=False)
    idx = np.sort(np.concatenate([np.nonzero(pos)[0], keep_neg]))
    return ds.subset(idx)


def main(out_root, seed=42, arms=("scratch", "pretrained", "contrastive"),
         fractions=FRACTIONS, rescue=False):
    """One full multi-arm sweep at training seed ``seed``. Fold splits stay
    fixed (all arms and all seeds see identical splits, so per-(fold,seed)
    Dice deltas are paired); the seed varies init/shuffle/augmentation —
    run several seeds and pool with --report-only over the parent dir.

    ``rescue=True``: the 10%-labels rescue recipe — negative-slice
    subsampling (frac_negative=0.25) + a 2x longer fine-tune — at
    fraction 0.1 only."""
    from ich_tpu.experiments.pretrain_finetune import label_efficiency_sweep

    os.makedirs(out_root, exist_ok=True)
    labeled, unlabeled = make_datasets()
    by_fold = folds_fn(labeled)
    if rescue:
        fractions = (0.1,)
        inner = by_fold

        def by_fold(k):  # noqa: F811 — rescue wrapper over the same splits
            tr, te = inner(k)
            rng = np.random.default_rng(1000 * seed + k)
            return subsample_negative_slices(tr, 0.25, rng), te

    # Arms merge into an existing results.json: fold splits are fixed
    # (folds_fn ignores the training seed) and each arm's Dice depends only
    # on (arm, seed, fold), so e.g. a contrastive-only run at seed 42 pairs
    # exactly against the scratch values already measured at seed 42 —
    # no need to re-run the measured arms.
    res_path = os.path.join(out_root, "results.json")
    results = {}
    if os.path.exists(res_path):
        with open(res_path) as f:
            results = json.load(f)
        print(f"merging new arms into existing {res_path} "
              f"(has: {sorted(results)})")
    for arm in arms:
        init = None
        if arm != "scratch":
            init = PRETRAINERS[arm](out_root, seed, unlabeled)
        cfg = base_cfg(out_root, arm)
        cfg["seed"] = seed
        if rescue:
            cfg["train"] = {**cfg["train"], "n_epoch": 80}
        dirs = label_efficiency_sweep(cfg, init, by_fold, fractions=fractions,
                                      seed=seed)
        results[arm] = {
            str(frac): collect_dice(d).tolist() for frac, d in dirs.items()
        }
        with open(res_path, "w") as f:  # checkpoint after every arm
            json.dump(results, f, indent=1)
    report(results, out_root)


ARM_LABELS = {"scratch": "scratch", "pretrained": "CR-pretrained",
              "contrastive": "contrastive", "contrastive_local": "contrastive+local"}


def pooled_report(parent_dir, out_root=None):
    """Pool per-(fold, seed) results from every ``results.json`` found under
    ``parent_dir`` (one subdir per seed) into a single paired table. Older
    two-arm seed runs pool fine next to three-arm ones — each arm's paired
    deltas only use seeds where both that arm and scratch ran."""
    import glob

    pooled = {}
    files = sorted(glob.glob(os.path.join(parent_dir, "*", "results.json")))
    if not files:  # committed snapshots: docs/label_efficiency_seedNN.json
        files = sorted(glob.glob(
            os.path.join(parent_dir, "label_efficiency_seed*.json")))
    if not files:
        files = [os.path.join(parent_dir, "results.json")]
    per_seed = []
    for fn in files:
        with open(fn) as f:
            res = json.load(f)
        per_seed.append(res)
        for arm, by_frac in res.items():
            for frac, vals in by_frac.items():
                pooled.setdefault(arm, {}).setdefault(frac, []).extend(vals)
    print(f"pooled {len(files)} runs")
    report(pooled, out_root or parent_dir, per_seed=per_seed)
    return pooled


def _paired(per_seed, arm, frac):
    """Paired (scratch, arm) value arrays across only the seeds that ran
    both arms (old two-arm seed dirs lack the contrastive arm)."""
    s, p = [], []
    for res in per_seed:
        if (arm in res and frac in res.get(arm, {})
                and frac in res.get("scratch", {})):
            s.extend(res["scratch"][frac])
            p.extend(res[arm][frac])
    return np.asarray(s), np.asarray(p)


def report(results, out_root, per_seed=None):
    arms = [a for a in ("scratch", "pretrained", "contrastive",
                        "contrastive_local") if a in results]
    pre_arms = [a for a in arms if a != "scratch"]
    if per_seed is None:
        per_seed = [results]
    head = "| labels | scratch (±1.96σ) |"
    sep = "|---|---|"
    for a in pre_arms:
        head += f" {ARM_LABELS[a]} (±1.96σ) | paired Δ [95% CI] |"
        sep += "---|---|"
    lines = [head, sep]
    for frac in FRACTIONS:
        if str(frac) not in results["scratch"]:
            continue
        s = np.asarray(results["scratch"][str(frac)])
        row = f"| {int(frac * 100)}% | {s.mean():.3f} ± {1.96 * s.std(ddof=1):.3f} |"
        for a in pre_arms:
            if str(frac) not in results[a]:
                # arm measured on a different fraction grid (e.g. a
                # rescue-only arm pooled next to the full sweep)
                row += " — | — |"
                continue
            p = np.asarray(results[a][str(frac)])
            sp, pp = _paired(per_seed, a, str(frac))
            d = pp - sp
            ci = 1.96 * d.std(ddof=1) / np.sqrt(len(d)) if len(d) > 1 else np.nan
            try:  # paired Wilcoxon signed-rank (the reference-grade test)
                from scipy.stats import wilcoxon

                wp = wilcoxon(d).pvalue if len(d) > 4 and np.any(d != 0) else np.nan
            except Exception:
                wp = np.nan
            row += (f" {p.mean():.3f} ± {1.96 * p.std(ddof=1):.3f} "
                    f"| {d.mean():+.3f} [{d.mean() - ci:+.3f}, {d.mean() + ci:+.3f}]"
                    f" (n={len(d)}, p={wp:.3g}) |")
        lines.append(row)
    table = "\n".join(lines)
    print(table)
    with open(os.path.join(out_root, "label_efficiency_table.md"), "w") as f:
        f.write(table + "\n")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from ich_tpu.postprocessing.plots import curve_std

        fracs = [f for f in FRACTIONS if str(f) in results["scratch"]]
        fig, ax = plt.subplots(figsize=(5, 4))
        xs = np.asarray(fracs) * 100
        series, labels = [], []
        for arm in arms:
            if any(str(f) not in results[arm] for f in fracs):
                continue  # arm measured on a different fraction grid
            cols = np.stack([np.asarray(results[arm][str(f)]) for f in fracs])
            series.append(np.concatenate([xs[:, None], cols], axis=1))
            labels.append(ARM_LABELS[arm])
        curve_std(series, labels, ax=ax)
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
    ap.add_argument("--arms", default="scratch,pretrained,contrastive",
                    help="comma-separated subset of scratch/pretrained/"
                         "contrastive/contrastive_local (scratch is the "
                         "pairing anchor)")
    ap.add_argument("--rescue", action="store_true",
                    help="10%%-labels rescue probe: fraction 0.1 only, "
                         "frac_negative=0.25 slice subsampling + 2x epochs")
    ap.add_argument("--report-only", action="store_true",
                    help="re-render table/figure from existing results.json "
                         "(pools every */results.json under --out)")
    args = ap.parse_args()
    if args.report_only:
        pooled_report(args.out)
    else:
        main(args.out, seed=args.seed, arms=tuple(args.arms.split(",")),
             rescue=args.rescue)
