"""Real-dataset on-disk format rehearsal: spec-faithful RSNA stage-2 and
qureAI CQ500 fixtures (written from the layouts the reference's own
generators consume — ``generate_RSNA_csv.py``, ``qureAI_extract_as_nifti.py``)
run through the data-preparation CLIs and every loader.

The PhysioNet publicSegICH fixture lives in test_data_io / write_segich_tree.
"""

import os
import sys

import numpy as np
import pandas as pd
import pytest
from click.testing import CliRunner

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
sys.path.insert(0, SCRIPTS)

from ich_tpu.data.synthetic import write_cq500_tree, write_rsna_tree


@pytest.fixture(scope="module")
def rsna_tree(tmp_path_factory):
    d = tmp_path_factory.mktemp("rsna")
    csv_fn = write_rsna_tree(str(d), n_slices=9, size=32, seed=3)
    return d, csv_fn


def test_gen_rsna_csv_pivot(rsna_tree, tmp_path):
    import data_preparation

    d, csv_fn = rsna_tree
    out_csv = str(tmp_path / "slice_info.csv")
    r = CliRunner().invoke(
        data_preparation.cli,
        ["gen-rsna-csv", "--label-csv", csv_fn, "--out-csv", out_csv],
    )
    assert r.exit_code == 0, r.output
    piv = pd.read_csv(out_csv, index_col=0)
    # one row per slice, the corrupted id dropped (generate_RSNA_csv.py:42-44)
    assert len(piv) == 9
    assert not (piv.filename == "ID_6431af929.dcm").any()
    # wide multilabel schema with 'any' renamed to Hemorrhage
    for col in ("Hemorrhage", "epidural", "subdural", "no_Hemorrhage", "filename"):
        assert col in piv.columns
    assert "any" not in piv.columns
    # duplicated long rows must aggregate by max, not mean: every label is 0/1
    vals = piv[["Hemorrhage", "epidural", "subdural"]].to_numpy()
    assert set(np.unique(vals)) <= {0.0, 1.0}
    # positive slices carry exactly one subtype
    pos = piv[piv.Hemorrhage == 1]
    assert len(pos) > 0
    sub = pos[["epidural", "intraparenchymal", "intraventricular",
               "subarachnoid", "subdural"]].to_numpy()
    assert (sub.sum(axis=1) == 1).all()


def test_rsna_loader_over_fixture(rsna_tree, tmp_path):
    import data_preparation

    from ich_tpu.data.datasets import load_rsna_slices

    d, csv_fn = rsna_tree
    out_csv = str(tmp_path / "slice_info.csv")
    CliRunner().invoke(
        data_preparation.cli,
        ["gen-rsna-csv", "--label-csv", csv_fn, "--out-csv", out_csv],
    )
    piv = pd.read_csv(out_csv, index_col=0)
    ds = load_rsna_slices(str(d / "stage_2_train"), slice_df=piv, size=32)
    assert ds.images.shape == (9, 32, 32)
    assert ds.labels.shape == (9, 7)
    # HU decode sanity: windowed intensities in [0, 1], with real contrast
    assert 0.0 <= ds.images.min() and ds.images.max() <= 1.0
    assert ds.images.std() > 0.05
    # labels follow the csv (column 0 = Hemorrhage)
    np.testing.assert_array_equal(ds.labels[:, 0], piv["Hemorrhage"].to_numpy())


def test_qure_extract_layout(tmp_path):
    import data_preparation

    from ich_tpu.data import nifti
    from ich_tpu.data.dicom import read_ct_hu

    root = tmp_path / "cq500"
    write_cq500_tree(str(root), n_patients=2, n_slices=5, size=32, seed=7)
    out = tmp_path / "niftis"
    r = CliRunner().invoke(
        data_preparation.cli,
        ["qure-extract", "--input-path", str(root), "--out-folder", str(out)],
    )
    assert r.exit_code == 0, r.output
    info = pd.read_csv(out / "info.csv", index_col=0)
    assert len(info) == 2
    assert set(info.filename) == {"0.nii", "1.nii"}
    assert (info.n_slice == 5).all()
    assert "ICH" in info.columns  # merged from ICH_probabilities.csv

    # slice order must follow ImagePositionPatient z, not the (shuffled)
    # filename order: reconstruct the expected z-sorted stack per patient
    vol, _, _ = nifti.load(str(out / "0.nii"))
    assert vol.shape == (32, 32, 5)
    pdir = root / "0"
    slices = {}
    for fn in os.listdir(pdir):
        from ich_tpu.data.dicom import read_dicom

        dd = read_dicom(str(pdir / fn))
        z = dd["ImagePositionPatient"][2]
        slices[z] = read_ct_hu(str(pdir / fn))
    want = np.stack([slices[z] for z in sorted(slices)], axis=2)
    np.testing.assert_allclose(vol, want, atol=1e-3)
