"""Supervised segmentation with an anomaly-attention channel.

Mirror of ``scripts/ad_attention_unet-2D/adUNet2D_scripts.py``: the AD maps
exported by ``ad_inpainting.py --export-attention`` are stacked as a second
input channel and a gated-conv U-Net is trained on (image, attention) pairs.
"""

import click

from _common import load_cfg, setup_logger


@click.command()
@click.argument("config_path", type=click.Path(exists=True))
def main(config_path):
    cfg = load_cfg(config_path)
    setup_logger()
    from ich_tpu.data.datasets import load_segich_attention_2d
    from ich_tpu.experiments import run_supervised_2d

    cfg.setdefault("net", {})["gated"] = True

    size = cfg["data"]["size"]
    win = (cfg["data"]["win_center"], cfg["data"]["win_width"])
    full = load_segich_attention_2d(cfg["path"]["DATA"], window=win, size=size)

    import numpy as np
    from sklearn.model_selection import StratifiedKFold

    vols = np.unique(full.vol_ids)
    has_ich = np.asarray([
        full.masks[full.vol_ids == v].max() > 0 for v in vols
    ]).astype(int)
    skf = StratifiedKFold(n_splits=cfg["split"]["n_fold"], shuffle=True,
                          random_state=cfg.get("seed", 42))
    splits = list(skf.split(vols, has_ich))

    def folds(k):
        tr_idx, te_idx = splits[k]
        tr = np.isin(full.vol_ids, vols[tr_idx])
        te = np.isin(full.vol_ids, vols[te_idx])
        return full.subset(np.nonzero(tr)[0]), full.subset(np.nonzero(te)[0])

    out = run_supervised_2d(cfg, datasets_by_fold=folds)
    click.echo(f"Artifacts at {out}")


if __name__ == "__main__":
    main()
