"""CLI surface tests: data prep roundtrip, supervised CLI, inference CLI,
figures — driven through click runners on synthetic data."""

import json
import os
import sys

import numpy as np
import pytest
from click.testing import CliRunner

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
sys.path.insert(0, SCRIPTS)

pytestmark = pytest.mark.slow  # end-to-end: excluded from the fast subset



@pytest.fixture(scope="module")
def nifti_dataset(tmp_path_factory):
    """Synthetic NIfTI dataset dir (ct_scans/ + masks/)."""
    from ich_tpu.data import nifti
    from ich_tpu.data.synthetic import synthetic_ich_volume

    d = tmp_path_factory.mktemp("nifti")
    os.makedirs(d / "ct_scans")
    os.makedirs(d / "masks")
    for pid in (1, 2, 3):
        vol, mask = synthetic_ich_volume(size=32, depth=8, seed=pid)
        nifti.save(str(d / "ct_scans" / f"{pid:03}.nii"), vol)
        nifti.save(str(d / "masks" / f"{pid:03}.nii"), mask.astype(np.uint8))
    return d


def test_data_preparation_gen_2d_seg(nifti_dataset, tmp_path):
    import data_preparation

    out = str(tmp_path / "seg2d")
    r = CliRunner().invoke(
        data_preparation.cli,
        ["gen-2d-seg", "--data-dir", str(nifti_dataset), "--out-dir", out],
    )
    assert r.exit_code == 0, r.output
    assert os.path.exists(os.path.join(out, "ct_info.csv"))
    assert os.path.exists(os.path.join(out, "patient_info.csv"))
    # loader round-trip
    from ich_tpu.data.segich import load_segich_2d

    ds = load_segich_2d(out, window=(50, 200), size=32)
    assert len(ds) == 24  # 3 patients x 8 slices
    assert ds.images.min() >= 0 and ds.images.max() <= 1


def test_gen_rsna_csv(tmp_path):
    import pandas as pd

    import data_preparation

    rows = []
    for sop in ("ID_a", "ID_b"):
        for st in ("any", "epidural", "subdural"):
            rows.append({"ID": f"{sop}_{st}", "Label": int(sop == "ID_a" and st == "any")})
    src = str(tmp_path / "stage2.csv")
    pd.DataFrame(rows).to_csv(src, index=False)
    out = str(tmp_path / "slice_info.csv")
    r = CliRunner().invoke(data_preparation.cli,
                           ["gen-rsna-csv", "--label-csv", src, "--out-csv", out])
    assert r.exit_code == 0, r.output
    df = pd.read_csv(out)
    assert set(df.columns) >= {"filename", "Hemorrhage", "no_Hemorrhage"}
    assert df.Hemorrhage.sum() == 1


def test_unet2d_cli_and_segment_brain(nifti_dataset, tmp_path):
    """End-to-end: prep 2D dataset -> train via CLI -> full-volume inference
    via segment_brain CLI."""
    import data_preparation
    import segment_brain
    import unet2d

    # prep
    data_dir = str(tmp_path / "d2")
    r = CliRunner().invoke(
        data_preparation.cli,
        ["gen-2d-seg", "--data-dir", str(nifti_dataset), "--out-dir", data_dir],
    )
    assert r.exit_code == 0, r.output
    # train (tiny)
    cfg = {
        "exp_name": "cli_e2e",
        "path": {"DATA": data_dir, "OUTPUT": str(tmp_path / "out")},
        "seed": 0,
        "data": {"win_center": 50, "win_width": 200, "size": 32,
                 "augmentation": {"train": {"HFlip": {"p": 0.5}}, "eval": {}}},
        "dataset": {"frac_negative": 2},
        "split": {"n_fold": 2, "shuffle": True},
        "net": {"depth": 3, "top_filter": 4, "p_dropout": 0.0, "midchannels_factor": 1},
        "train": {"loss_fn": "BinaryDiceLoss",
                  "loss_fn_kwargs": {"reduction": "mean", "p": 2, "alpha": 0.2},
                  "n_epoch": 1, "batch_size": 8, "lr": 1e-3, "validate_epoch": False},
    }
    cfg_fn = str(tmp_path / "cfg.json")
    json.dump(cfg, open(cfg_fn, "w"))
    r = CliRunner().invoke(unet2d.main, [cfg_fn])
    assert r.exit_code == 0, r.output
    model_fn = str(tmp_path / "out" / "cli_e2e" / "Fold_1" / "trained_unet.bin")
    assert os.path.exists(model_fn)
    # full-volume inference CLI
    out_dir = str(tmp_path / "preds")
    r = CliRunner().invoke(
        segment_brain.main,
        [str(nifti_dataset / "ct_scans" / "001.nii"), "-o", out_dir, "-m", model_fn,
         "--depth", "3", "--top-filter", "4", "--size", "32", "--batch-size", "8"],
    )
    assert r.exit_code == 0, r.output
    from ich_tpu.data import nifti

    pred, _, _ = nifti.load(os.path.join(out_dir, "001_mask.nii.gz"))
    assert pred.shape == (32, 32, 8)
    assert set(np.unique(pred)) <= {0, 255}


def test_figures_cli(nifti_dataset, tmp_path):
    import data_preparation
    import figures

    data_dir = str(tmp_path / "dfig")
    CliRunner().invoke(data_preparation.cli,
                       ["gen-2d-seg", "--data-dir", str(nifti_dataset), "--out-dir", data_dir])
    out = str(tmp_path / "stats.pdf")
    r = CliRunner().invoke(figures.cli, ["dataset-stats", "--data-dir", data_dir, "--out-fn", out])
    assert r.exit_code == 0, r.output
    assert os.path.getsize(out) > 2000

    mont = str(tmp_path / "mont.png")
    r = CliRunner().invoke(
        figures.cli,
        ["view-volume", str(nifti_dataset / "ct_scans" / "001.nii"),
         "--mask-path", str(nifti_dataset / "masks" / "001.nii"),
         "--out-fn", mont, "--n-slices", "4"],
    )
    assert r.exit_code == 0, r.output
    assert os.path.getsize(mont) > 2000

    # 3D MIP three-view (the pyvista view_volume.py replacement)
    mip = str(tmp_path / "mip3d.png")
    r = CliRunner().invoke(
        figures.cli,
        ["view-volume", str(nifti_dataset / "ct_scans" / "001.nii"),
         "--mask-path", str(nifti_dataset / "masks" / "001.nii"),
         "--out-fn", mip, "--mode", "3d"],
    )
    assert r.exit_code == 0, r.output
    assert os.path.getsize(mip) > 2000


def test_figures_rsna_stats(tmp_path):
    import pandas as pd

    import figures

    rng = np.random.default_rng(0)
    n = 40
    df = pd.DataFrame({
        "filename": [f"ID_{i}.dcm" for i in range(n)],
        "Hemorrhage": rng.integers(0, 2, n),
        "intraventricular": rng.integers(0, 2, n),
        "subdural": rng.integers(0, 2, n),
    })
    csv = str(tmp_path / "slice_info.csv")
    df.to_csv(csv)
    out = str(tmp_path / "rsna_stats.pdf")
    r = CliRunner().invoke(figures.cli, ["rsna-stats", "--csv-path", csv, "--out-fn", out])
    assert r.exit_code == 0, r.output
    assert os.path.getsize(out) > 2000


def test_figures_explore_metadata_and_gif(tmp_path):
    """Data-exploration figure parity (VERDICT r3 item 7): age/gender
    metadata PDF + per-patient CT GIF from the spec-faithful fixture tree
    (reference figure_scripts/data_exploration.py:39-58,239)."""
    import figures
    from ich_tpu.data.synthetic import synthetic_ich_slices, write_segich_tree

    ds = synthetic_ich_slices(n_slices=12, size=32, n_volumes=3, seed=4)
    data_dir = write_segich_tree(ds, str(tmp_path / "tree"))
    import pandas as pd

    pdf = pd.read_csv(os.path.join(data_dir, "patient_info.csv"), index_col=0)
    assert {"Age", "Gender"} <= set(pdf.columns)

    out_dir = str(tmp_path / "figs")
    pid = int(pdf.PatientNumber.iloc[0])
    r = CliRunner().invoke(
        figures.cli,
        ["explore", "--data-dir", data_dir, "--out-dir", out_dir,
         "--gif-patient", str(pid)],
    )
    assert r.exit_code == 0, r.output
    assert os.path.getsize(os.path.join(out_dir, "metadata_stat.pdf")) > 2000
    assert os.path.getsize(os.path.join(out_dir, f"{pid}_CT.gif")) > 1000


def test_serve_cli_once(nifti_dataset, tmp_path):
    """Watch-folder server: drain a backlog with --once, idempotent restart."""
    import serve

    from ich_tpu.models import UNet
    from ich_tpu.train import UNet2D

    model_fn = str(tmp_path / "served_model.bin")
    tr = UNet2D(UNet(depth=3, top_filter=4, p_dropout=0.0))
    tr._ensure_state((32, 32))
    tr.save_model(model_fn)

    out_dir = str(tmp_path / "served")
    args = ["--watch-dir", str(nifti_dataset / "ct_scans"), "-o", out_dir,
            "-m", model_fn, "--mode", "2.5d", "--depth", "3",
            "--top-filter", "4", "--size", "32", "--once"]
    r = CliRunner().invoke(serve.main, args)
    assert r.exit_code == 0, r.output

    from ich_tpu.data import nifti

    for pid in (1, 2, 3):
        mask_fn = os.path.join(out_dir, f"{pid:03}_mask.nii.gz")
        assert os.path.exists(mask_fn)
        assert os.path.exists(os.path.join(out_dir, f"{pid:03}.done"))
        pred, _, _ = nifti.load(mask_fn)
        assert pred.shape == (32, 32, 8)
    # restart with everything done: serves nothing, exits immediately
    r = CliRunner().invoke(serve.main, args)
    assert r.exit_code == 0, r.output
    assert "_mask.nii.gz" not in r.output  # no per-volume serve lines


def test_serve_cli_3d_mode(nifti_dataset, tmp_path):
    """3D sliding-window serving keeps the NIfTI (H, W, D) orientation."""
    import serve

    from ich_tpu.models import UNet
    from ich_tpu.train import UNet3D

    model_fn = str(tmp_path / "served3d.bin")
    net = UNet(depth=2, ndim=3, top_filter=4, p_dropout=0.0, norm="group")
    tr = UNet3D(net, patch_size=(8, 16, 16))
    tr._ensure_state((8, 16, 16))
    tr.save_model(model_fn)

    out_dir = str(tmp_path / "served3d_out")
    r = CliRunner().invoke(serve.main, [
        "--watch-dir", str(nifti_dataset / "ct_scans"), "-o", out_dir,
        "-m", model_fn, "--mode", "3d", "--depth", "2", "--top-filter", "4",
        "--patch", "8", "--once"])
    assert r.exit_code == 0, r.output

    from ich_tpu.data import nifti

    pred, _, _ = nifti.load(os.path.join(out_dir, "001_mask.nii.gz"))
    assert pred.shape == (32, 32, 8)  # same orientation as the input file
    assert set(np.unique(pred)) <= {0, 255}


def test_serve_cli_corrupt_file_quarantined(nifti_dataset, tmp_path):
    """A torn/corrupt upload must not crash the server: it is retried then
    quarantined via a .failed marker while good files keep serving."""
    import shutil

    import serve

    from ich_tpu.models import UNet
    from ich_tpu.train import UNet2D

    watch = tmp_path / "watch"
    os.makedirs(watch)
    shutil.copy(nifti_dataset / "ct_scans" / "001.nii", watch / "001.nii")
    with open(watch / "corrupt.nii.gz", "wb") as f:
        f.write(b"\x1f\x8b not a real gzip stream")

    model_fn = str(tmp_path / "m.bin")
    tr = UNet2D(UNet(depth=3, top_filter=4, p_dropout=0.0))
    tr._ensure_state((32, 32))
    tr.save_model(model_fn)

    out_dir = str(tmp_path / "out")
    args = ["--watch-dir", str(watch), "-o", out_dir, "-m", model_fn,
            "--mode", "2.5d", "--depth", "3", "--top-filter", "4",
            "--size", "32", "--once"]
    for _ in range(serve.MAX_RETRIES):  # each --once pass retries the bad file
        r = CliRunner().invoke(serve.main, args)
        assert r.exit_code == 0, r.output
    assert os.path.exists(os.path.join(out_dir, "001_mask.nii.gz"))
    assert os.path.exists(os.path.join(out_dir, "001.done"))
    assert os.path.exists(os.path.join(out_dir, "corrupt.failed"))
    # quarantined file no longer selected
    assert serve._pending(str(watch), out_dir) == []


def test_serve_vol_name_strips_only_trailing_extension():
    """Done-marker names must strip ONLY a trailing .nii/.nii.gz: a blanket
    str.replace collapses distinct uploads (e.g. a.nii_v2.nii.gz and
    a_v2.nii.gz) onto one marker and silently drops one of them."""
    import serve

    assert serve._vol_name("scan.nii") == "scan"
    assert serve._vol_name("scan.nii.gz") == "scan"
    assert serve._vol_name("/in/scan.nii.gz") == "scan"
    assert serve._vol_name("a.nii_v2.nii.gz") == "a.nii_v2"  # embedded .nii kept


def test_serve_cli_watch_dir_equals_output_dir(nifti_dataset, tmp_path):
    """watch_dir == output_dir must not re-ingest the *_mask.nii.gz the
    server itself wrote (which would endlessly mask the masks)."""
    import shutil

    import serve

    from ich_tpu.models import UNet
    from ich_tpu.train import UNet2D

    d = tmp_path / "inout"
    os.makedirs(d)
    shutil.copy(nifti_dataset / "ct_scans" / "001.nii", d / "001.nii")

    model_fn = str(tmp_path / "m.bin")
    tr = UNet2D(UNet(depth=3, top_filter=4, p_dropout=0.0))
    tr._ensure_state((32, 32))
    tr.save_model(model_fn)

    args = ["--watch-dir", str(d), "-o", str(d), "-m", model_fn,
            "--mode", "2.5d", "--depth", "3", "--top-filter", "4",
            "--size", "32", "--once"]
    r = CliRunner().invoke(serve.main, args)
    assert r.exit_code == 0, r.output
    assert os.path.exists(d / "001_mask.nii.gz")
    # second pass: the mask output is not treated as a new upload
    r = CliRunner().invoke(serve.main, args)
    assert r.exit_code == 0, r.output
    assert not os.path.exists(d / "001_mask_mask.nii.gz")
    assert serve._pending(str(d), str(d)) == []


def test_figures_explore_without_metadata_columns(tmp_path):
    """`figures explore` on a tree whose patient_info.csv lacks Age/Gender
    (e.g. produced by gen-2d-seg without --demographics-csv) must skip the
    metadata figure but still honor --gif-patient."""
    import figures
    import pandas as pd

    from ich_tpu.data.synthetic import synthetic_ich_slices, write_segich_tree

    ds = synthetic_ich_slices(n_slices=8, size=32, n_volumes=2, seed=7)
    data_dir = write_segich_tree(ds, str(tmp_path / "tree"))
    info_fn = os.path.join(data_dir, "patient_info.csv")
    pdf = pd.read_csv(info_fn, index_col=0)
    pdf.drop(columns=[c for c in ("Age", "Gender") if c in pdf.columns],
             inplace=True)
    pdf.to_csv(info_fn)

    out_dir = str(tmp_path / "figs")
    pid = int(pdf.PatientNumber.iloc[0])
    r = CliRunner().invoke(
        figures.cli,
        ["explore", "--data-dir", data_dir, "--out-dir", out_dir,
         "--gif-patient", str(pid)],
    )
    assert r.exit_code == 0, r.output
    assert not os.path.exists(os.path.join(out_dir, "metadata_stat.pdf"))
    assert os.path.getsize(os.path.join(out_dir, f"{pid}_CT.gif")) > 1000


def test_inpainting_gan_cli_end_to_end(tmp_path):
    """Full inpainting-GAN training driver on a tiny synthetic RSNA
    fixture, incl. the net.remat config flag (reference
    ``scripts/inpainting/SNPatchGAN_scripts.py`` flow)."""
    import data_preparation
    import inpainting_gan

    from ich_tpu.data.synthetic import write_rsna_tree

    write_rsna_tree(str(tmp_path / "rsna"), n_slices=10, size=32, seed=0)
    data_dir = str(tmp_path / "rsna" / "stage_2_train")
    r = CliRunner().invoke(
        data_preparation.cli,
        ["gen-rsna-csv", "--label-csv", str(tmp_path / "rsna" / "stage_2_train.csv"),
         "--out-csv", os.path.join(data_dir, "slice_info.csv")],
    )
    assert r.exit_code == 0, r.output

    cfg = {
        "exp_name": "gan_cli", "seed": 1,
        "path": {"RSNA_DATA": data_dir, "OUTPUT": str(tmp_path / "out")},
        "data": {"win_center": 50, "win_width": 200, "size": 32},
        "dataset": {"n_max": 8},
        "net": {"self_attention": False, "lat_channels": 4, "remat": True,
                "disc_channels": [8, 8, 8]},
        "mask": {"n_draw": [1, 2], "vertex": [2, 4], "brush_width": [2, 4],
                 "length": [3, 8], "n_salt_pepper": [0, 3]},
        "train": {"n_epoch": 1, "batch_size": 4, "checkpoint_freq": 1},
    }
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    r = CliRunner().invoke(inpainting_gan.main, [cfg_path])
    assert r.exit_code == 0, r.output
    out_dir = tmp_path / "out" / "gan_cli"
    for fn in ("checkpoint.bin", "snpatchgan.bin", "outputs.json"):
        assert (out_dir / fn).exists(), fn
    outputs = json.load(open(out_dir / "outputs.json"))
    assert outputs["train"]["time"]
