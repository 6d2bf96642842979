"""ResNet slice-triage classifier (AD gate).

Mirror of ``scripts/binary_classification/BinaryResnet_scripts.py``:
train a ResNet-18/50 ICH/no-ICH slice classifier on RSNA, export weights
used as the gate by the anomaly-detection pipelines.
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

    from ich_tpu.data.core import LabeledSliceDataset
    from ich_tpu.data.datasets import load_rsna_slices
    from ich_tpu.models import resnet18, resnet50
    from ich_tpu.train import BinaryClassifier

    ds = load_rsna_slices(
        cfg["path"]["RSNA_DATA"],
        window=(cfg["data"]["win_center"], cfg["data"]["win_width"]),
        size=cfg["data"]["size"],
        n_max=cfg.get("dataset", {}).get("n_max"),
    )
    labels = np.asarray(ds.labels)
    data = LabeledSliceDataset(ds.images, labels[:, 0].astype(np.int32))
    factory = {"ResNet18": resnet18, "ResNet50": resnet50}[cfg["net"].get("name", "ResNet18")]
    tr = cfg["train"]
    clf = BinaryClassifier(
        factory(num_classes=2),
        n_epoch=tr["n_epoch"], batch_size=tr["batch_size"], lr=tr["lr"],
        lr_scheduler=tr.get("lr_scheduler", "ExponentialLR"),
        lr_scheduler_kwargs=tr.get("lr_scheduler_kwargs", {"gamma": 0.95}),
        weight_decay=tr.get("weight_decay", 1e-6),
        class_weight=tr.get("class_weight"), seed=cfg.get("seed", 42),
    )
    out_dir = os.path.join(cfg["path"]["OUTPUT"], cfg["exp_name"])
    os.makedirs(out_dir, exist_ok=True)
    clf.train(data, checkpoint_path=os.path.join(out_dir, "checkpoint.bin"))
    clf.evaluate(data, save_path=out_dir)
    clf.save_model(os.path.join(out_dir, "resnet_classifier.bin"))
    clf.save_outputs(os.path.join(out_dir, "outputs.json"))
    click.echo(f"Artifacts at {out_dir}")


if __name__ == "__main__":
    main()
