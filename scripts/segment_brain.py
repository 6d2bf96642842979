"""Full-volume inference CLI: NIfTI volume(s) → segmentation masks.

Mirror of ``scripts/brain_only/segment_brain.py``: load a trained 2D U-Net,
run ``segment_volume`` on each input NIfTI, save mask NIfTIs (``:85-92``) —
except the whole per-volume pipeline is one jitted device program here.
"""

import os

import click

from _common import setup_logger


@click.command()
@click.argument("vol_paths", nargs=-1, type=click.Path(exists=True))
@click.option("--output-dir", "-o", required=True, type=click.Path())
@click.option("--model", "-m", "model_path", required=True, type=click.Path(exists=True))
@click.option("--depth", default=5, type=int)
@click.option("--top-filter", default=32, type=int)
@click.option("--midchannels-factor", default=1, type=int)
@click.option("--size", default=256, type=int, help="network input size")
@click.option("--win-center", default=50.0, type=float)
@click.option("--win-width", default=200.0, type=float)
@click.option("--batch-size", default=16, type=int)
def main(vol_paths, output_dir, model_path, depth, top_filter, midchannels_factor,
         size, win_center, win_width, batch_size):
    setup_logger()
    from ich_tpu.data import nifti
    from ich_tpu.models import UNet
    from ich_tpu.train import UNet2D

    trainer = UNet2D(
        UNet(depth=depth, top_filter=top_filter,
             midchannels_factor=midchannels_factor, p_dropout=0.0),
        batch_size=batch_size,
    )
    trainer.load_model(model_path, image_shape=(size, size))
    os.makedirs(output_dir, exist_ok=True)
    affines, out_fns = [], []
    for vp in vol_paths:
        name = os.path.basename(vp).replace(".nii.gz", "").replace(".nii", "")
        out_fns.append(os.path.join(output_dir, f"{name}_mask.nii.gz"))

    def stream():  # lazy decode: host memory stays O(pipeline depth)
        for vp in vol_paths:
            vol, affine, _ = nifti.load(vp)
            affines.append(affine)
            yield vol

    # pipelined dispatch with a bounded in-flight window
    trainer.segment_volumes(
        stream(), affines=affines, save_fns=out_fns,
        window=(win_center, win_width), input_size=(size, size),
    )
    for vp, out_fn in zip(vol_paths, out_fns):
        click.echo(f"{vp} -> {out_fn}")


if __name__ == "__main__":
    main()
