"""FCDD anomaly localization: training and volume evaluation.

Mirror of ``scripts/FCDD/FCDD_scripts.py`` (train on RSNA with synthetic
ellipse anomalies) and ``scripts/FCDD/FCDD_eval_volumes.py`` (heatmap →
threshold → per-slice/volume Dice + pixel AUC, ResNet-gated).
"""

import click

from _common import load_cfg, setup_logger


@click.command()
@click.argument("config_path", type=click.Path(exists=True))
@click.option("--eval-volumes", is_flag=True, help="evaluate on the SegICH dataset")
def main(config_path, eval_volumes):
    cfg = load_cfg(config_path)
    setup_logger()
    import os

    import numpy as np

    from ich_tpu.models import FCDD_CNN_VGG
    from ich_tpu.train import FCDD

    size = cfg["data"]["size"]
    f = FCDD(
        FCDD_CNN_VGG(),
        artificial_anomaly=cfg.get("anomaly", {}).get("artificial", True),
        anomaly_proba=cfg.get("anomaly", {}).get("proba", 0.5),
        drawing_params=cfg.get("anomaly", {}).get("drawing_params", {}),
        gauss_std=cfg.get("anomaly", {}).get("gauss_std"),
        n_epoch=cfg["train"]["n_epoch"], batch_size=cfg["train"]["batch_size"],
        lr=cfg["train"]["lr"], seed=cfg.get("seed", 42),
    )
    out_dir = os.path.join(cfg["path"]["OUTPUT"], cfg["exp_name"])
    os.makedirs(out_dir, exist_ok=True)

    if not eval_volumes:
        from ich_tpu.data.core import LabeledSliceDataset
        from ich_tpu.data.datasets import load_rsna_slices

        ds = load_rsna_slices(
            cfg["path"]["RSNA_DATA"],
            window=(cfg["data"]["win_center"], cfg["data"]["win_width"]),
            size=size, n_max=cfg.get("dataset", {}).get("n_max"),
        )
        data = LabeledSliceDataset(ds.images, np.asarray(ds.labels)[:, 0])
        f.train(data, valid_dataset=data,
                checkpoint_path=os.path.join(out_dir, "checkpoint.bin"))
        f.get_min_max(data.images[:512])
        f.localize_anomalies(data.images, os.path.join(out_dir, "localization"))
        f.save_model(os.path.join(out_dir, "fcdd.bin"))
        f.save_outputs(os.path.join(out_dir, "outputs.json"))
    else:

        from ich_tpu.data.segich import load_segich_2d
        from ich_tpu.ops.metrics import pixel_auc

        f.load_model(cfg["ad"]["model_path"], image_shape=(size, size))
        test = load_segich_2d(cfg["path"]["DATA"],
                              window=(cfg["data"]["win_center"], cfg["data"]["win_width"]),
                              size=size)
        f.get_min_max(test.images[: min(512, len(test))])
        heat = f.generate_heatmap(test.images)
        thr = cfg["ad"].get("threshold", 0.5)
        from ich_tpu.postprocessing.update_pred import slice_score_row, write_prediction_scores

        rows = []
        for i in range(len(test)):
            pred = (heat[i] >= thr).astype(np.float32)
            t = test.masks[i]
            rows.append(slice_score_row(
                pred, t, test.vol_ids[i], test.slice_nbrs[i],
                pixel_AUC=pixel_auc(heat[i], t) if t.max() > 0 else float("nan")))
        df, v = write_prediction_scores(rows, out_dir)
        click.echo(f"volume Dice: {v.Dice.mean():.4f}; "
                   f"pixel AUC (pos slices): {df.pixel_AUC.mean():.4f}")
    click.echo(f"Artifacts at {out_dir}")


if __name__ == "__main__":
    main()
