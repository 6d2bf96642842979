"""SN-PatchGAN inpainting training on non-ICH RSNA slices.

Mirror of ``scripts/inpainting/SNPatchGAN_scripts.py`` — the reference's
only multi-GPU workload (``torch.nn.DataParallel`` opt-in ``:116-121``);
here data parallelism is the mesh default (SPMD over ``data``).
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

    from ich_tpu.data.core import SliceDataset2D
    from ich_tpu.data.datasets import load_rsna_slices
    from ich_tpu.models import GatedGenerator, PatchDiscriminator, SAGatedGenerator
    from ich_tpu.train import SNPatchGAN

    ds = load_rsna_slices(
        cfg["path"]["RSNA_DATA"],
        window=(cfg["data"]["win_center"], cfg["data"]["win_width"]),
        size=cfg["data"]["size"],
        n_max=cfg.get("dataset", {}).get("n_max"),
    )
    normal = np.asarray(ds.labels)[:, 0] == 0  # train on non-ICH slices only
    images = ds.images[normal]
    data = SliceDataset2D(images, np.zeros_like(images),
                          np.arange(len(images)), np.zeros(len(images), np.int32))

    n = cfg["net"]
    gen_cls = SAGatedGenerator if n.get("self_attention", True) else GatedGenerator
    # remat=true gradient-checkpoints the gated convs + attention: same
    # numerics/checkpoints, unlocks batches the plain step OOMs at (bs64)
    g = gen_cls(lat_channels=n.get("lat_channels", 32), return_coarse=True,
                remat=bool(n.get("remat", False)))
    d = PatchDiscriminator(out_channels=tuple(n.get("disc_channels", (64, 128, 256, 256, 256, 256))))
    tr = cfg["train"]
    gan = SNPatchGAN(
        g, d, n_epoch=tr["n_epoch"], batch_size=tr["batch_size"],
        lr_g=tr.get("lr_g", 1e-4), lr_d=tr.get("lr_d", 4e-4),
        lambda_L1=tr.get("lambda_L1", 0.5), lambda_gan=tr.get("lambda_gan", 0.5),
        gammaL1=tr.get("gammaL1", 0.99),
        mask_kwargs=cfg.get("mask", {}),
        checkpoint_freq=tr.get("checkpoint_freq", 3), seed=cfg.get("seed", 42),
    )
    out_dir = os.path.join(cfg["path"]["OUTPUT"], cfg["exp_name"])
    os.makedirs(out_dir, exist_ok=True)
    gan.train(data, valid_dataset=data,
              checkpoint_path=os.path.join(out_dir, "checkpoint.bin"),
              valid_path=os.path.join(out_dir, "valid"))
    gan.save_model(os.path.join(out_dir, "snpatchgan.bin"))
    gan.save_outputs(os.path.join(out_dir, "outputs.json"))
    click.echo(f"Artifacts at {out_dir}")


if __name__ == "__main__":
    main()
