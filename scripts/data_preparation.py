"""Dataset preparation CLIs.

Mirrors of the reference's ``scripts/data_preparation/`` tools:

- ``gen-2d-seg``    ← ``generate_2DSegDataset.py``: NIfTI volumes → per-slice
  tif/bmp + ``ct_info.csv``/``patient_info.csv`` (rot90; masks written only
  for positive slices).
- ``gen-2d-brain``  ← ``generate_2DBrainDataset.py``: same for brain masks.
- ``gen-rsna-csv``  ← ``generate_RSNA_csv.py``: pivot the RSNA stage-2 label
  csv to a per-slice multilabel ``slice_info.csv``.
- ``dicom-to-nifti``← ``qureAI_extract_as_nifti.py``: DICOM series → NIfTI.
"""

import os

import click

from _common import setup_logger


@click.group()
def cli():
    setup_logger()


def _write_2d_dataset(data_dir, out_dir, mask_subdir, demographics_csv=None):
    import numpy as np
    import pandas as pd
    from PIL import Image

    from ich_tpu.data import nifti

    os.makedirs(out_dir, exist_ok=True)
    ct_rows, patient_rows = [], []
    scans = sorted(os.listdir(os.path.join(data_dir, "ct_scans")))
    for fn in scans:
        pid = int(os.path.splitext(fn.replace(".nii", ""))[0])
        vol, _, _ = nifti.load(os.path.join(data_dir, "ct_scans", fn))
        mask, _, _ = nifti.load(os.path.join(data_dir, mask_subdir, fn))
        vol = np.rot90(vol, axes=(0, 1))
        mask = np.rot90(mask, axes=(0, 1))
        pdir = os.path.join(out_dir, f"{pid}")
        os.makedirs(os.path.join(pdir, "ct"), exist_ok=True)
        os.makedirs(os.path.join(pdir, "mask"), exist_ok=True)
        any_pos = 0
        for s in range(vol.shape[2]):
            ct_fn = f"{pid}/ct/{s}.tif"
            Image.fromarray(vol[:, :, s].astype(np.int32), mode="I").save(
                os.path.join(out_dir, ct_fn)
            )
            pos = int(mask[:, :, s].max() > 0)
            any_pos |= pos
            mask_fn = "-"
            if pos:  # masks written only for positive slices (reference)
                mask_fn = f"{pid}/mask/{s}.bmp"
                Image.fromarray(((mask[:, :, s] > 0) * 255).astype(np.uint8)).save(
                    os.path.join(out_dir, mask_fn)
                )
            ct_rows.append({"PatientNumber": pid, "SliceNumber": s,
                            "CT_fn": ct_fn, "mask_fn": mask_fn, "Hemorrhage": pos})
        patient_rows.append({"PatientNumber": pid, "Hemorrhage": any_pos})
    pd.DataFrame(ct_rows).to_csv(os.path.join(out_dir, "ct_info.csv"))
    patient_df = pd.DataFrame(patient_rows)
    if demographics_csv:
        # the PhysioNet Patient_demographics.csv layout the reference parses
        # (generate_2DSegDataset.py:37-39: header row 1, 2 footer rows,
        # unnamed Age/Gender columns)
        demo = pd.read_csv(
            demographics_csv, header=1, skipfooter=2, engine="python"
        ).rename(columns={"Unnamed: 0": "PatientNumber", "Unnamed: 1": "Age",
                          "Unnamed: 2": "Gender"})
        cols = [c for c in ("PatientNumber", "Age", "Gender") if c in demo.columns]
        patient_df = patient_df.merge(demo[cols], on="PatientNumber", how="left")
    patient_df.to_csv(os.path.join(out_dir, "patient_info.csv"))
    click.echo(f"Wrote {len(ct_rows)} slices / {len(patient_rows)} patients to {out_dir}")


@cli.command("gen-2d-seg")
@click.option("--data-dir", required=True, type=click.Path(exists=True),
              help="dir with ct_scans/ and masks/ NIfTIs")
@click.option("--out-dir", required=True, type=click.Path())
@click.option("--demographics-csv", default=None, type=click.Path(exists=True),
              help="PhysioNet Patient_demographics.csv; merges Age/Gender "
                   "into patient_info.csv (reference "
                   "generate_2DSegDataset.py:37-39)")
def gen_2d_seg(data_dir, out_dir, demographics_csv):
    _write_2d_dataset(data_dir, out_dir, "masks", demographics_csv)


@cli.command("gen-2d-brain")
@click.option("--data-dir", required=True, type=click.Path(exists=True))
@click.option("--out-dir", required=True, type=click.Path())
@click.option("--mask-subdir", default="brain_masks")
def gen_2d_brain(data_dir, out_dir, mask_subdir):
    _write_2d_dataset(data_dir, out_dir, mask_subdir)


@cli.command("gen-rsna-csv")
@click.option("--label-csv", required=True, type=click.Path(exists=True),
              help="RSNA stage-2 train csv (ID,Label with ID=<sop>_<subtype>)")
@click.option("--out-csv", required=True, type=click.Path())
def gen_rsna_csv(label_csv, out_csv):
    """Pivot RSNA stage-2 labels to per-slice multilabel rows
    (reference ``generate_RSNA_csv.py``)."""
    import pandas as pd

    df = pd.read_csv(label_csv)
    parts = df.ID.str.rsplit("_", n=1, expand=True)
    df["sop"], df["subtype"] = parts[0], parts[1]
    # duplicate label rows exist in the stage-2 csv: aggregate by max, like
    # the reference's groupby(...).max().unstack (generate_RSNA_csv.py:37)
    piv = (
        df.groupby(["sop", "subtype"])["Label"].max().unstack(level=-1).reset_index()
    )
    piv.columns.name = None
    piv["filename"] = piv.sop + ".dcm"
    piv = piv.rename(columns={"any": "Hemorrhage"})
    if "Hemorrhage" not in piv.columns:  # filtered csvs may lack 'any' rows
        piv["Hemorrhage"] = 0
    piv["no_Hemorrhage"] = 1 - piv["Hemorrhage"]
    # the reference intends to drop the corrupted ID_6431af929.dcm but its
    # comparison includes a 'stage_2_train/' prefix the column never has
    # (generate_RSNA_csv.py:44) — implement the intent
    piv = piv[piv.filename != "ID_6431af929.dcm"]
    piv.to_csv(out_csv)
    click.echo(f"Wrote {len(piv)} slice rows to {out_csv}")


@cli.command("dicom-to-nifti")
@click.option("--series-dir", required=True, type=click.Path(exists=True))
@click.option("--out-fn", required=True, type=click.Path())
def dicom_to_nifti(series_dir, out_fn):
    """Stack a DICOM series directory into one NIfTI volume
    (reference ``qureAI_extract_as_nifti.py``)."""
    from ich_tpu.data import nifti
    from ich_tpu.data.dicom import series_to_volume

    paths = [os.path.join(series_dir, f) for f in sorted(os.listdir(series_dir))
             if f.lower().endswith(".dcm")]
    vol, affine = series_to_volume(paths)
    nifti.save(out_fn, vol, affine)
    click.echo(f"Wrote {vol.shape} volume to {out_fn}")


@cli.command("qure-extract")
@click.option("--input-path", required=True, type=click.Path(exists=True),
              help="CQ500 root: one DICOM-series subdir per patient id + "
                   "ICH_probabilities.csv")
@click.option("--out-folder", required=True, type=click.Path())
def qure_extract(input_path, out_folder):
    """Batch-convert the qureAI CQ500 layout to NIfTI volumes + info.csv
    (reference ``qureAI_extract_as_nifti.py:24-64``: per-patient series dir →
    ``<ID>.nii``; out rows {id, filename, n_slice} merged with
    ``ICH_probabilities.csv`` on the patient id, outer join)."""
    import pandas as pd

    from ich_tpu.data import nifti
    from ich_tpu.data.dicom import series_to_volume

    os.makedirs(out_folder, exist_ok=True)
    rows = []
    for name in sorted(os.listdir(input_path)):
        pdir = os.path.join(input_path, name)
        if not os.path.isdir(pdir):
            continue
        paths = [os.path.join(pdir, f) for f in sorted(os.listdir(pdir))
                 if f.lower().endswith(".dcm")]
        if not paths:
            continue
        vol, affine = series_to_volume(paths)
        nifti.save(os.path.join(out_folder, f"{name}.nii"), vol, affine)
        rows.append({"id": int(name), "filename": f"{name}.nii",
                     "n_slice": len(paths)})
    fn_df = pd.DataFrame(rows)
    prob_fn = os.path.join(input_path, "ICH_probabilities.csv")
    if os.path.exists(prob_fn):
        in_df = pd.read_csv(prob_fn, index_col=0)
        fn_df = pd.merge(fn_df, in_df, left_on="id", right_index=True, how="outer")
    fn_df.to_csv(os.path.join(out_folder, "info.csv"))
    click.echo(f"Wrote {len(rows)} volumes + info.csv to {out_folder}")


if __name__ == "__main__":
    cli()
