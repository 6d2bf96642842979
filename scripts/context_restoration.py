"""Context-restoration SSL pretraining → 10-fold supervised fine-tune.

Mirror of ``scripts/context_restoration/ContextRestoration_UNet2D_scripts.py``:
phase 1 patch-swap MSE pretraining on unlabeled RSNA slices, phase 2 k-fold
fine-tune via ``transfer_weights`` (``:310-312``). One JSON config argument.
"""

import click

from _common import load_cfg, setup_logger


@click.command()
@click.argument("config_path", type=click.Path(exists=True))
def main(config_path):
    cfg = load_cfg(config_path)
    setup_logger()
    from ich_tpu.data.datasets import load_rsna_slices
    from ich_tpu.data.segich import load_segich_2d
    from ich_tpu.experiments import (
        pretrain_context_restoration,
        run_supervised_2d_with_init,
    )

    ssl_data = load_rsna_slices(
        cfg["path"]["RSNA_DATA"],
        window=(cfg["data"]["win_center"], cfg["data"]["win_width"]),
        size=cfg["data"]["size"],
        n_max=cfg.get("dataset", {}).get("n_max"),
    )
    weights = pretrain_context_restoration(cfg, ssl_data)
    out = run_supervised_2d_with_init(cfg, weights, None)
    click.echo(f"Artifacts at {out}")


if __name__ == "__main__":
    main()
