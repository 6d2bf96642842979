"""3D patch-based U-Net training + sliding-window evaluation.

The BASELINE config-2/3 workload (the reference's 3D trainer is broken;
SURVEY §2.5): train on random 3D patches from NIfTI volumes with
foreground oversampling, evaluate with Gaussian-blended sliding-window
inference (volumetric Dice + IoU).
"""

import click

from _common import load_cfg, setup_logger


@click.command()
@click.argument("config_path", type=click.Path(exists=True))
def main(config_path):
    cfg = load_cfg(config_path)
    setup_logger()
    import os

    import numpy as np

    from ich_tpu.data.datasets import load_segich_3d
    from ich_tpu.models import UNet
    from ich_tpu.train import UNet3D

    data_dir = cfg["path"]["DATA"]
    pids = cfg["dataset"]["patient_numbers"]
    win = (cfg["data"]["win_center"], cfg["data"]["win_width"])
    ds = load_segich_3d(data_dir, pids, window=win,
                        out_spacing=tuple(cfg["data"].get("out_spacing", (-1, -1, 2.5))))
    n_test = max(1, int(0.2 * len(ds)))
    from ich_tpu.data.core import VolumeDataset3D

    train = VolumeDataset3D(ds.volumes[:-n_test], ds.masks[:-n_test], ds.vol_ids[:-n_test])
    test = VolumeDataset3D(ds.volumes[-n_test:], ds.masks[-n_test:], ds.vol_ids[-n_test:])

    n = cfg["net"]
    tr = cfg["train"]
    net = UNet(depth=n.get("depth", 4), ndim=3, top_filter=n.get("top_filter", 16),
               midchannels_factor=n.get("midchannels_factor", 1),
               p_dropout=n.get("p_dropout", 0.0), norm=n.get("norm", "group"))
    trainer = UNet3D(
        net,
        patch_size=tuple(cfg["data"].get("patch_size", (64, 128, 128))),
        steps_per_epoch=tr.get("steps_per_epoch", 100),
        pos_frac=tr.get("pos_frac", 0.5),
        n_epoch=tr["n_epoch"], batch_size=tr["batch_size"], lr=tr["lr"],
        loss_fn=tr.get("loss_fn", "BinaryDiceLoss"),
        loss_fn_kwargs=tr.get("loss_fn_kwargs", {"reduction": "mean", "p": 2, "alpha": 0.2}),
        sw_overlap=tr.get("sw_overlap", 0.5), sw_batch_size=tr.get("sw_batch_size"),
        seed=cfg.get("seed", 42),
    )
    out_dir = os.path.join(cfg["path"]["OUTPUT"], cfg["exp_name"])
    os.makedirs(out_dir, exist_ok=True)
    trainer.train(train, valid_dataset=None,
                  checkpoint_path=os.path.join(out_dir, "checkpoint.bin"))
    trainer.evaluate(test, save_path=out_dir)
    trainer.save_model(os.path.join(out_dir, "trained_unet3d.bin"))
    trainer.save_outputs(os.path.join(out_dir, "outputs.json"))
    click.echo(f"Dice (all): {trainer.outputs['eval']['dice']['all']:.4f}; "
               f"artifacts at {out_dir}")


if __name__ == "__main__":
    main()
