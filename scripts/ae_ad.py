"""AE training + AE-based anomaly detection.

Mirror of ``scripts/AE/AE_scripts.py`` (train the reconstruction AE on
normal slices) and ``scripts/AE/AD_AE_scripts.py`` (detect anomalies via
|im − rec| with q75+α·IQR hysteresis, gated by a ResNet classifier, then
slice/volume Dice + pixel AUC).
"""

import click

from _common import load_cfg, setup_logger


@click.command()
@click.argument("config_path", type=click.Path(exists=True))
@click.option("--detect", is_flag=True, help="run anomaly detection instead of training")
def main(config_path, detect):
    cfg = load_cfg(config_path)
    setup_logger()
    import os

    import numpy as np

    from ich_tpu.models import AENet
    from ich_tpu.train import AE

    n = cfg["net"]
    ae = AE(
        AENet(latent_channels=n.get("latent_channels", 64),
              bottleneck_channels=n.get("bottelneck_channels", 64),
              n_conv=n.get("n_conv", 3), bilinear=n.get("bilinear", False),
              kernel_size=n.get("kernel_size", 5)),
        lambda_GDL=cfg["train"].get("lambda_GDL"),
        n_epoch=cfg["train"]["n_epoch"], batch_size=cfg["train"]["batch_size"],
        lr=cfg["train"]["lr"], seed=cfg.get("seed", 42),
    )
    out_dir = os.path.join(cfg["path"]["OUTPUT"], cfg["exp_name"])
    os.makedirs(out_dir, exist_ok=True)

    if not detect:
        from ich_tpu.data.datasets import load_rsna_slices

        ds = load_rsna_slices(
            cfg["path"]["RSNA_DATA"],
            window=(cfg["data"]["win_center"], cfg["data"]["win_width"]),
            size=cfg["data"]["size"], n_max=cfg.get("dataset", {}).get("n_max"),
        )
        normal = np.asarray(ds.labels)[:, 0] == 0
        from ich_tpu.data.core import SliceDataset2D

        imgs = ds.images[normal]
        data = SliceDataset2D(imgs, np.zeros_like(imgs), np.arange(len(imgs)),
                              np.zeros(len(imgs), np.int32))
        ae.train(data, valid_dataset=data,
                 checkpoint_path=os.path.join(out_dir, "checkpoint.bin"),
                 valid_path=os.path.join(out_dir, "valid"))
        ae.save_model(os.path.join(out_dir, "ae.bin"))
        ae.save_outputs(os.path.join(out_dir, "outputs.json"))
    else:

        from ich_tpu.data.segich import load_segich_2d
        from ich_tpu.ops import morphology as morph
        from ich_tpu.ops.metrics import pixel_auc
        import jax.numpy as jnp

        ae.load_model(cfg["ad"]["model_path"],
                      image_shape=(cfg["data"]["size"], cfg["data"]["size"]))
        test = load_segich_2d(cfg["path"]["DATA"],
                              window=(cfg["data"]["win_center"], cfg["data"]["win_width"]),
                              size=cfg["data"]["size"])
        amaps = ae.anomaly_map(test.images)
        alpha = cfg["ad"].get("alpha", 1.5)
        from ich_tpu.postprocessing.update_pred import slice_score_row, write_prediction_scores

        rows = []
        for i in range(len(test)):
            lo, hi = morph.quantile_iqr_thresholds(jnp.asarray(amaps[i]), alpha)
            pred = np.asarray(morph.hysteresis_threshold(jnp.asarray(amaps[i]), lo, hi))
            t = test.masks[i]
            rows.append(slice_score_row(
                pred, t, test.vol_ids[i], test.slice_nbrs[i],
                pixel_AUC=pixel_auc(amaps[i], t) if t.max() > 0 else float("nan")))
        df, v = write_prediction_scores(rows, out_dir)
        click.echo(f"volume Dice (all): {v.Dice.mean():.4f}")
    click.echo(f"Artifacts at {out_dir}")


if __name__ == "__main__":
    main()
