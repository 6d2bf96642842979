"""Exploration / figure CLIs.

Equivalents of the reference's ``figure_scripts/`` (dataset statistics
figures + ``view_volume.py`` 3D rendering): dataset stats plots from the
csv, and a volume montage viewer (pyvista is not available in this image;
the montage covers the inspection use-case).
"""

import os

import click

from _common import setup_logger


@click.group()
def cli():
    setup_logger()


@cli.command("dataset-stats")
@click.option("--data-dir", required=True, type=click.Path(exists=True))
@click.option("--out-fn", default="dataset_stats.pdf", type=click.Path())
def dataset_stats(data_dir, out_fn):
    """Slice/patient counts, positive fractions, per-patient slice counts."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    df = pd.read_csv(os.path.join(data_dir, "ct_info.csv"), index_col=0)
    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    df.groupby("PatientNumber").size().hist(bins=20, ax=axes[0], color="dodgerblue")
    axes[0].set_title("Slices per patient")
    counts = df.Hemorrhage.value_counts()
    axes[1].bar(["non-ICH", "ICH"], [counts.get(0, 0), counts.get(1, 0)],
                color=["dodgerblue", "tomato"])
    axes[1].set_title("Slice labels")
    frac = df.groupby("PatientNumber").Hemorrhage.mean()
    axes[2].hist(frac, bins=20, color="tomato")
    axes[2].set_title("Positive-slice fraction per patient")
    fig.savefig(out_fn, bbox_inches="tight")
    click.echo(f"Wrote {out_fn}")


@cli.command("explore")
@click.option("--data-dir", required=True, type=click.Path(exists=True))
@click.option("--out-dir", default=".", type=click.Path())
@click.option("--gif-patient", default=None, type=int,
              help="Also write <id>_CT.gif animating this patient's slices "
                   "with the ICH mask overlaid.")
@click.option("--fps", default=4, type=int)
def explore(data_dir, out_dir, gif_patient, fps):
    """Data-exploration parity (reference
    ``figure_scripts/data_exploration.py``): the patient metadata figure
    (age histogram + gender bars, ``:39-58``) and, with ``--gif-patient``,
    the per-patient CT+mask GIF (``:239`` via ``pred2GIF``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    patient_df = pd.read_csv(os.path.join(data_dir, "patient_info.csv"), index_col=0)
    has_meta = {"Age", "Gender"} <= set(patient_df.columns)
    if not has_meta:
        # gen-2d-seg without --demographics-csv: no metadata figure, but
        # the --gif-patient branch below must stay reachable
        click.echo("patient_info.csv has no Age/Gender columns; skipping "
                   "metadata_stat.pdf")
    if has_meta:
        _plot_metadata(patient_df, out_dir, plt, np)

    if gif_patient is not None:
        _write_gif(data_dir, out_dir, gif_patient, fps, np)


def _plot_metadata(patient_df, out_dir, plt, np):
    fig, (ax1, ax2) = plt.subplots(
        1, 2, figsize=(10, 4), gridspec_kw=dict(width_ratios=[0.75, 0.25])
    )
    color = "#fdab48"  # the reference's xkcd:mango
    ax1.hist(patient_df["Age"], color=color, bins=80 // 5, range=(0, 80))
    ax1.hist(patient_df["Age"], histtype="step", color="black",
             bins=80 // 5, range=(0, 80), linewidth=1)
    ax1.set_xlabel("Patient age")
    ax1.set_ylabel("Count [-]")
    ax1.set_title("Patients Age Distribution")
    counts = patient_df.Gender.value_counts()
    ax2.bar(np.arange(len(counts)) + 0.5, counts.values,
            tick_label=list(counts.index), width=0.8, color=color,
            edgecolor="black", linewidth=1)
    ax2.set_title("Patients Gender Distribution")
    for ax in (ax1, ax2):
        ax.spines["top"].set_visible(False)
        ax.spines["right"].set_visible(False)
    meta_fn = os.path.join(out_dir, "metadata_stat.pdf")
    fig.savefig(meta_fn, dpi=300, bbox_inches="tight")
    plt.close(fig)
    click.echo(f"Wrote {meta_fn}")


def _write_gif(data_dir, out_dir, gif_patient, fps, np):
    import pandas as pd
    from PIL import Image

    from ich_tpu.postprocessing.plots import pred2gif

    ct_df = pd.read_csv(os.path.join(data_dir, "ct_info.csv"), index_col=0)
    rows = ct_df[ct_df.PatientNumber == gif_patient].sort_values("SliceNumber")
    if rows.empty:
        raise click.ClickException(f"no slices for patient {gif_patient}")
    imgs, masks = [], []
    for _, r in rows.iterrows():
        im = np.asarray(Image.open(os.path.join(data_dir, r.CT_fn)), np.float32)
        lo, hi = im.min(), im.max()
        imgs.append((im - lo) / max(hi - lo, 1e-6))
        # same sentinel set as the dataset loader (data/segich.py): a
        # negative slice is "-" from gen-2d-seg, "None"/"nan" elsewhere
        if isinstance(r.mask_fn, str) and r.mask_fn not in ("", "-", "None", "nan"):
            m = np.asarray(Image.open(os.path.join(data_dir, r.mask_fn))) > 0
        else:
            m = np.zeros(im.shape, bool)
        masks.append(m.astype(np.float32))
    gif_fn = os.path.join(out_dir, f"{gif_patient}_CT.gif")
    pred2gif(imgs, masks, gif_fn, fps=fps)
    click.echo(f"Wrote {gif_fn}")


@cli.command("rsna-stats")
@click.option("--csv-path", required=True, type=click.Path(exists=True),
              help="slice_info.csv from the gen-rsna-csv CLI")
@click.option("--out-fn", default="rsna_data_stats.pdf", type=click.Path())
def rsna_stats(csv_path, out_fn):
    """RSNA class-repartition figure (reference
    ``figure_scripts/RSNA_data_exploration.py:50-94``): ICH vs no-ICH slice
    bar, linked by a curved flow band to an inset of per-subtype counts."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.ticker import FuncFormatter
    import pandas as pd

    from ich_tpu.postprocessing.plots import draw_curved_rect

    def human(num, pos=None):
        mag = 0
        while abs(num) >= 1000:
            mag += 1
            num /= 1000.0
        return "%.0f%s" % (num, ["", "K", "M", "G"][mag])

    df = pd.read_csv(csv_path, index_col=0)
    subtypes = ["intraventricular", "intraparenchymal", "subarachnoid",
                "epidural", "subdural"]
    subtypes = [s for s in subtypes if s in df.columns]
    n_pos = int(df.Hemorrhage.sum())
    n_neg = int(len(df) - n_pos)

    fig, ax = plt.subplots(1, 1, figsize=(9, 4))
    ax.bar([0.5, 1.5], [n_neg, n_pos], tick_label=["No ICH", "ICH"],
           width=0.8, color="orange", edgecolor="black", linewidth=1)
    ax.set_title("ICH by CT Slice", fontweight="bold", loc="left")
    ax.set_ylabel("Number of CT Slices")
    ax.yaxis.set_major_formatter(FuncFormatter(human))
    ax.set_xlim(0, 6)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)

    # flow band from the ICH bar into the subtype inset
    top = ax.get_ylim()[1]
    draw_curved_rect(1.9, 4.0, 0.0, n_pos, 0.0, top, ax=ax,
                     color="lightgray", alpha=0.5)
    ax_in = ax.inset_axes([4, 0, 2, top], transform=ax.transData)
    if subtypes:
        counts = df[subtypes].sum(axis=0).values
        ax_in.bar(range(len(subtypes)), counts, tick_label=subtypes,
                  width=0.8, color="orange", edgecolor="black", linewidth=1)
        ax_in.set_xticklabels(subtypes, rotation=25, ha="right", fontsize=8)
    ax_in.set_title("Slices by ICH Type", fontweight="bold", loc="left",
                    fontsize=10)
    ax_in.yaxis.set_ticks_position("right")
    ax_in.yaxis.set_major_formatter(FuncFormatter(human))
    ax_in.patch.set_facecolor("lightgray")
    ax_in.patch.set_alpha(0.5)
    fig.savefig(out_fn, dpi=300, bbox_inches="tight")
    click.echo(f"Wrote {out_fn}")


def _mip_three_view(vol, mask, spacing, out_fn):
    """Axial / coronal / sagittal maximum-intensity projections with a red
    rendered-mask overlay — the matplotlib replacement for the reference's
    pyvista 3D volume rendering (``figure_scripts/view_volume.py:24-212``;
    pyvista is unavailable in this image). Voxel spacing sets the aspect so
    anisotropic CTs (e.g. 5 mm slices) are not distorted."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    sx, sy, sz = spacing
    views = [
        ("Axial MIP", 2, sx / sy),      # rows=x, cols=y; aspect = row/col unit
        ("Coronal MIP", 1, sz / sx),    # project along y
        ("Sagittal MIP", 0, sz / sy),   # project along x
    ]
    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    for ax, (title, axis, aspect) in zip(axes, views):
        mip = vol.max(axis=axis)
        if axis != 2:  # head pointing up for the through-plane views
            mip = mip.T[::-1]
        ax.imshow(mip, cmap="gray", vmin=0, vmax=1, aspect=aspect)
        if mask is not None:
            mmip = (mask > 0).max(axis=axis).astype(float)
            if axis != 2:
                mmip = mmip.T[::-1]
            overlay = np.zeros(mmip.shape + (4,))
            overlay[mmip > 0] = (0.9, 0.2, 0.1, 0.55)
            ax.imshow(overlay, aspect=aspect)
        ax.set_title(title, fontsize=11, fontweight="bold", loc="left")
        ax.set_xticks([])
        ax.set_yticks([])
    fig.savefig(out_fn, bbox_inches="tight", dpi=150)
    plt.close(fig)


@cli.command("view-volume")
@click.argument("vol_path", type=click.Path(exists=True))
@click.option("--mask-path", type=click.Path(exists=True), default=None)
@click.option("--out-fn", default="volume_montage.png", type=click.Path())
@click.option("--win-center", default=50.0, type=float)
@click.option("--win-width", default=200.0, type=float)
@click.option("--n-slices", default=16, type=int)
@click.option("--mode", default="montage", type=click.Choice(["montage", "3d"]),
              help="'montage' = slice grid; '3d' = axial/coronal/sagittal MIP three-view")
def view_volume(vol_path, mask_path, out_fn, win_center, win_width, n_slices, mode):
    """Inspect a NIfTI volume: slice montage or 3D MIP three-view
    (± mask overlay)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from ich_tpu.data import nifti
    from ich_tpu.ops.ct import window_ct
    from ich_tpu.postprocessing.plots import imshow_pred

    vol, affine, _ = nifti.load(vol_path)
    vol = np.asarray(window_ct(vol.astype(np.float32), win_center, win_width))
    mask = None
    if mask_path:
        mask, _, _ = nifti.load(mask_path)
    if mode == "3d":
        spacing = np.abs(np.asarray(affine)[:3, :3]).max(axis=0)
        spacing = np.where(spacing > 0, spacing, 1.0)
        _mip_three_view(vol, mask, spacing, out_fn)
        click.echo(f"Wrote {out_fn}")
        return
    zs = np.linspace(0, vol.shape[2] - 1, n_slices).astype(int)
    ncol = 4
    nrow = -(-n_slices // ncol)
    fig, axes = plt.subplots(nrow, ncol, figsize=(3 * ncol, 3 * nrow))
    for ax, z in zip(np.ravel(axes), zs):
        if mask is not None:
            imshow_pred(vol[:, :, z], mask[:, :, z] > 0, ax=ax)
        else:
            ax.imshow(vol[:, :, z], cmap="gray")
            ax.set_xticks([]); ax.set_yticks([])
        ax.set_title(f"z={z}", fontsize=8)
    for ax in np.ravel(axes)[len(zs):]:
        ax.axis("off")
    fig.savefig(out_fn, bbox_inches="tight", dpi=100)
    click.echo(f"Wrote {out_fn}")


if __name__ == "__main__":
    cli()
