"""Inpainting-based anomaly detection over a 2D dataset.

Mirror of ``scripts/AD_inpainting/AD_inpainting_scripts.py``: load a trained
SN-PatchGAN generator + ResNet gate, run ``robust_anomaly_detect`` on every
gated-positive slice, write slice/volume Dice CSVs. (The reference script
has a latent NameError on ``tf.`` — SURVEY §2.10 — fixed by construction.)

Also covers ``scripts/AD_inpainting/update_publicDataset.py`` via
``--export-attention``: copy the anomaly maps next to the dataset as the
"attention" channel + info.csv for the attention-U-Net workload.
"""

import click

from _common import load_cfg, setup_logger


@click.command()
@click.argument("config_path", type=click.Path(exists=True))
@click.option("--export-attention", type=click.Path(), default=None,
              help="dir to export anomaly maps as attention channel + info.csv")
def main(config_path, export_attention):
    cfg = load_cfg(config_path)
    setup_logger()
    import os

    import numpy as np
    import pandas as pd

    from ich_tpu.data.segich import load_segich_2d
    from ich_tpu.models import GatedGenerator, PatchDiscriminator, SAGatedGenerator, resnet18
    from ich_tpu.postprocessing.update_pred import slice_score_row, write_prediction_scores
    from ich_tpu.train import BinaryClassifier, InpaintAnomalyDetector, SNPatchGAN, robust_anomaly_detect

    size = cfg["data"]["size"]
    test = load_segich_2d(cfg["path"]["DATA"],
                          window=(cfg["data"]["win_center"], cfg["data"]["win_width"]),
                          size=size)

    n = cfg["net"]
    gen_cls = SAGatedGenerator if n.get("self_attention", True) else GatedGenerator
    g = gen_cls(lat_channels=n.get("lat_channels", 32), return_coarse=True)
    d = PatchDiscriminator()
    gan = SNPatchGAN(g, d)
    gan.load_model(cfg["ad"]["generator_path"], image_shape=(size, size))

    gate = None
    if cfg["ad"].get("classifier_path"):
        gate = BinaryClassifier(resnet18(num_classes=2))
        gate.load_model(cfg["ad"]["classifier_path"], image_shape=(size, size))

    det = InpaintAnomalyDetector(
        gan.inpaint,
        grid_hole=tuple(cfg["ad"].get("grid_hole", (32, 32))),
        grid_step=cfg["ad"].get("grid_step", 16),
        batch_size=cfg["ad"].get("batch_size", 16),
        use_wasserstein=cfg["ad"].get("use_wasserstein", False),
        n_iter=cfg["ad"].get("n_iter", 3),
    )

    out_dir = os.path.join(cfg["path"]["OUTPUT"], cfg["exp_name"])
    os.makedirs(out_dir, exist_ok=True)
    rows = []
    att_rows = []
    # gate the whole test set in ONE batched call: per-slice batch-1 calls
    # would pay the ~34 ms tunnel fetch per slice (CLAUDE.md)
    gate_scores = None
    if gate is not None:
        gate_scores = np.asarray(gate.predict_scores(test.images))
    for i in range(len(test)):
        img = test.images[i]
        gated_pos = True
        if gate_scores is not None:
            gated_pos = float(gate_scores[i]) >= cfg["ad"].get("gate_threshold", 0.5)
        if gated_pos:
            pred, amap = robust_anomaly_detect(
                img, det,
                angles_list=cfg["ad"].get("angles", [-15, -7.5, 7.5, 15]),
                flip=cfg["ad"].get("flip", True),
            )
        else:
            pred = np.zeros_like(img, dtype=bool)
            amap = np.zeros_like(img)
        t = test.masks[i]
        rows.append(slice_score_row(pred, t, test.vol_ids[i], test.slice_nbrs[i]))
        if export_attention:
            from PIL import Image

            vd = os.path.join(export_attention, str(int(test.vol_ids[i])))
            os.makedirs(vd, exist_ok=True)
            rel = f"{int(test.vol_ids[i])}/{int(test.slice_nbrs[i])}_attention.png"
            Image.fromarray((np.clip(amap, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(export_attention, rel))
            att_rows.append({"PatientNumber": int(test.vol_ids[i]),
                             "SliceNumber": int(test.slice_nbrs[i]),
                             "attention_fn": rel})
    df, v = write_prediction_scores(rows, out_dir)
    if export_attention and att_rows:
        pd.DataFrame(att_rows).to_csv(os.path.join(export_attention, "info.csv"))
    click.echo(f"volume Dice (all): {v.Dice.mean():.4f}; artifacts at {out_dir}")


if __name__ == "__main__":
    main()
