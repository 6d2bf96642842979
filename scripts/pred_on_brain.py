"""Post-filter experiment predictions by brain masks.

Mirror of ``scripts/brain_only/pred_on_brain.py``: AND every saved slice
prediction of a k-fold experiment with brain masks and recompute scores.
"""

import click

from _common import setup_logger


@click.command()
@click.option("--exp-dir", required=True, type=click.Path(exists=True))
@click.option("--data-dir", required=True, type=click.Path(exists=True),
              help="SegICH 2D dataset dir (targets)")
@click.option("--brain-dir", required=True, type=click.Path(exists=True),
              help="dir of brain-mask bmps laid out as {vol}/{slice}.bmp")
@click.option("--n-fold", default=10, type=int)
@click.option("--size", default=256, type=int)
def main(exp_dir, data_dir, brain_dir, n_fold, size):
    setup_logger()
    import os

    import numpy as np
    from PIL import Image

    from ich_tpu.data.segich import load_segich_2d
    from ich_tpu.postprocessing.update_pred import update_kfold_folder

    ds = load_segich_2d(data_dir, size=size)

    def dataset_for_fold(k):
        return ds

    def brain_masks_for_fold(k):
        masks = np.zeros_like(ds.masks)
        for i in range(len(ds)):
            fn = os.path.join(brain_dir, f"{int(ds.vol_ids[i])}/{int(ds.slice_nbrs[i])}.bmp")
            if os.path.exists(fn):
                # NEAREST: bicubic would interpolate/overshoot the binary
                # mask and '>0' would dilate the brain boundary
                masks[i] = (np.asarray(
                    Image.open(fn).resize((size, size), Image.NEAREST)) > 0)
            else:
                masks[i] = 1.0  # no brain mask -> keep everything
        return masks

    update_kfold_folder(exp_dir, n_fold, dataset_for_fold, brain_masks_for_fold)
    click.echo(f"Updated {exp_dir}")


if __name__ == "__main__":
    main()
