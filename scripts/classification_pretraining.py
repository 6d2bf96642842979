"""Classification pretraining (binary or 7-way multilabel) → fine-tune.

Mirror of ``scripts/binary_classification_pretraining/…`` and
``scripts/multiclass_classification_pretraining/…``: RSNA slice
classification of the U-Net encoder (class-weighted CE / BCE), then k-fold
supervised fine-tune from the pretrained encoder.
"""

import click

from _common import load_cfg, setup_logger


@click.command()
@click.argument("config_path", type=click.Path(exists=True))
@click.option("--multi", is_flag=True, help="7-way multilabel pretraining")
def main(config_path, multi):
    cfg = load_cfg(config_path)
    setup_logger()
    from ich_tpu.data.datasets import load_rsna_slices
    from ich_tpu.experiments import pretrain_classifier, run_supervised_2d_with_init

    ds = load_rsna_slices(
        cfg["path"]["RSNA_DATA"],
        window=(cfg["data"]["win_center"], cfg["data"]["win_width"]),
        size=cfg["data"]["size"],
        n_max=cfg.get("dataset", {}).get("n_max"),
    )
    weights = pretrain_classifier(cfg, ds, multi=multi)
    out = run_supervised_2d_with_init(cfg, weights, None)
    click.echo(f"Artifacts at {out}")


if __name__ == "__main__":
    main()
