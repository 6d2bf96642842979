"""Supervised 2D U-Net ICH segmentation CLI.

Usage: ``python scripts/unet2d.py CONFIG.json`` — same one-JSON-argument
surface as the reference's ``scripts/unet-2D/UNet2D_scripts.py:35-37`` and
the same config schema (``UNet2D_config.json``).
"""

import click

from _common import load_cfg  # also enables the persistent compile cache


@click.command()
@click.argument("config_path", type=click.Path(exists=True))
def main(config_path):
    from ich_tpu.experiments import run_supervised_2d

    cfg = load_cfg(config_path)
    out = run_supervised_2d(cfg)
    click.echo(f"Experiment artifacts written to {out}")


if __name__ == "__main__":
    main()
