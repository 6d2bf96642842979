"""Brain-extraction U-Net: k-fold CV then train-on-all.

Mirror of ``scripts/brain_extraction/UNet2Dbrain_scripts.py``: 5-fold CV of
a brain-mask U-Net on qureAI-derived 2D data, then a final model trained on
everything (for gating the ICH pipelines).
"""

import click

from _common import load_cfg, setup_logger


@click.command()
@click.argument("config_path", type=click.Path(exists=True))
def main(config_path):
    cfg = load_cfg(config_path)
    setup_logger()
    import os

    from ich_tpu.data.datasets import load_brain_extract_2d
    from ich_tpu.experiments import run_supervised_2d
    from ich_tpu.experiments.supervised2d import build_unet_from_cfg
    from ich_tpu.train import UNet2D

    out = run_supervised_2d(cfg)
    click.echo(f"CV artifacts at {out}")

    # train-on-all final model
    ds = load_brain_extract_2d(
        cfg["path"]["DATA"],
        window=(cfg["data"]["win_center"], cfg["data"]["win_width"]),
        size=cfg["data"]["size"],
    )
    tr = cfg["train"]
    trainer = UNet2D(
        build_unet_from_cfg(cfg["net"]),
        n_epoch=tr["n_epoch"], batch_size=tr["batch_size"], lr=tr["lr"],
        loss_fn=tr.get("loss_fn", "BinaryDiceLoss"),
        loss_fn_kwargs=tr.get("loss_fn_kwargs", {"reduction": "mean"}),
        seed=cfg.get("seed", 42),
    )
    trainer.train(ds.device_cache(),
                  checkpoint_path=os.path.join(out, "final_checkpoint.bin"))
    trainer.save_model(os.path.join(out, "final_brain_unet.bin"))
    click.echo(f"Final model at {os.path.join(out, 'final_brain_unet.bin')}")


if __name__ == "__main__":
    main()
