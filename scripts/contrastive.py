"""Contrastive SSL pretraining (global ± local) → supervised fine-tune.

Mirror of ``scripts/contrastive/Contrastive_UNet2D_scripts.py`` (global
InfoNCE on the U-Net encoder, optional local InfoNCE on the partial U-Net
with frozen transferred weights ``:214-217``, then 10-fold fine-tune).
"""

import click

from _common import load_cfg, setup_logger


@click.command()
@click.argument("config_path", type=click.Path(exists=True))
def main(config_path):
    cfg = load_cfg(config_path)
    setup_logger()
    from ich_tpu.data.datasets import load_rsna_slices
    from ich_tpu.experiments import pretrain_contrastive, run_supervised_2d_with_init

    ssl_data = load_rsna_slices(
        cfg["path"]["RSNA_DATA"],
        window=(cfg["data"]["win_center"], cfg["data"]["win_width"]),
        size=cfg["data"]["size"],
        n_max=cfg.get("dataset", {}).get("n_max"),
    )
    weights = pretrain_contrastive(cfg, ssl_data)
    out = run_supervised_2d_with_init(cfg, weights, None)
    click.echo(f"Artifacts at {out}")


if __name__ == "__main__":
    main()
