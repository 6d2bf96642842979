"""Label-efficiency sweep: pretrain once, fine-tune at label fractions.

BASELINE config 5: contrastive (or context-restoration) pretraining followed
by supervised fine-tuning at 10/25/50/100% of labeled patients; reports the
volumetric Dice at each fraction.
"""

import click

from _common import load_cfg, setup_logger


@click.command()
@click.argument("config_path", type=click.Path(exists=True))
@click.option("--pretrain", type=click.Choice(["none", "context_restoration", "contrastive", "classifier"]),
              default="contrastive")
@click.option("--fractions", default="0.1,0.25,0.5,1.0")
@click.option("--low-label-recipe/--no-low-label-recipe", default=False,
              help="For fractions <0.15: cap negative slices at 0.25x the "
                   "positive count (reference frac_negative analog, "
                   "UNet2D_scripts.py:121-123) and double the fine-tune "
                   "epochs — the measured 10%-labels rescue recipe "
                   "(docs/BENCHMARKS.md).")
def main(config_path, pretrain, fractions, low_label_recipe):
    cfg = load_cfg(config_path)
    setup_logger()
    from ich_tpu.data.datasets import load_rsna_slices
    from ich_tpu.experiments import (
        label_efficiency_sweep,
        pretrain_classifier,
        pretrain_context_restoration,
        pretrain_contrastive,
    )

    weights = None
    if pretrain != "none":
        ssl_data = load_rsna_slices(
            cfg["path"]["RSNA_DATA"],
            window=(cfg["data"]["win_center"], cfg["data"]["win_width"]),
            size=cfg["data"]["size"], n_max=cfg.get("dataset", {}).get("n_max"),
        )
        weights = {
            "context_restoration": pretrain_context_restoration,
            "contrastive": pretrain_contrastive,
            "classifier": pretrain_classifier,
        }[pretrain](cfg, ssl_data)

    fracs = tuple(float(f) for f in fractions.split(","))
    recipe = ({"below": 0.15, "frac_negative": 0.25, "epoch_mult": 2}
              if low_label_recipe else None)
    results = label_efficiency_sweep(cfg, weights, None, fractions=fracs,
                                     seed=cfg.get("seed", 42),
                                     low_label_recipe=recipe)
    for f, out in results.items():
        with open(f"{out}/average_scores.txt") as fh:
            click.echo(f"fraction {f:.0%}: {fh.read().strip()}")


if __name__ == "__main__":
    main()
