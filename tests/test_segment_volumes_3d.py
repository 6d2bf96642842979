"""UNet3D.segment_volumes (pipelined) must equal per-volume segment_volume."""

import jax
import numpy as np
import pytest

from ich_tpu.data.synthetic import synthetic_ich_volume
from ich_tpu.models.unet import UNet
from ich_tpu.train.segmentation3d import UNet3D


def test_3d_pipelined_matches_single(tmp_path):
    net = UNet(depth=2, ndim=3, top_filter=4, p_dropout=0.0, norm="group")
    tr = UNet3D(net, patch_size=(8, 16, 16), n_epoch=1, batch_size=2, lr=1e-3,
                loss_fn="BinaryDiceLoss", loss_fn_kwargs={"reduction": "mean"},
                sw_batch_size=4)
    tr._ensure_state((8, 16, 16), steps_per_epoch=1)
    vols = [np.transpose(synthetic_ich_volume(size=16, depth=8, seed=s)[0],
                         (2, 0, 1)) for s in (1, 2)]
    singles = [tr.segment_volume(v, window=(50, 200)) for v in vols]
    outs = tr.segment_volumes(vols, window=(50, 200),
                              save_fns=[None, str(tmp_path / "m.nii.gz")],
                              return_preds=True)
    for a, b in zip(singles, outs):
        np.testing.assert_array_equal(a, b)
    from ich_tpu.data import nifti

    data, _, _ = nifti.load(str(tmp_path / "m.nii.gz"))
    np.testing.assert_array_equal(data, outs[1])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_3d_segment_volumes_mesh_dispatch(tmp_path):
    """With a multi-device mesh and same-shaped volumes, segment_volumes
    routes through the volume-parallel SPMD path and must still equal the
    per-volume results (and still honor save_fns)."""
    from ich_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:8], axis_names=("data",))
    net = UNet(depth=2, ndim=3, top_filter=4, p_dropout=0.0, norm="group")
    tr = UNet3D(net, patch_size=(8, 16, 16), n_epoch=1, batch_size=2, lr=1e-3,
                loss_fn="BinaryDiceLoss", loss_fn_kwargs={"reduction": "mean"},
                sw_batch_size=4, mesh=mesh)
    tr._ensure_state((8, 16, 16), steps_per_epoch=1)
    vols = [np.transpose(synthetic_ich_volume(size=16, depth=8, seed=s)[0],
                         (2, 0, 1)) for s in (3, 4, 5)]
    singles = [tr.segment_volume(v, window=(50, 200)) for v in vols]
    outs = tr.segment_volumes(vols, window=(50, 200),
                              save_fns=[None, None, str(tmp_path / "p.nii.gz")],
                              return_preds=True)
    assert len(outs) == 3
    for a, b in zip(singles, outs):
        np.testing.assert_array_equal(a, b)
    from ich_tpu.data import nifti

    data, _, _ = nifti.load(str(tmp_path / "p.nii.gz"))
    np.testing.assert_array_equal(data, outs[2])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_3d_mesh_dispatch_multi_round_and_cache(tmp_path):
    """More volumes than devices: the volume-parallel engine runs bounded
    rounds of n_dev (HBM stays O(1) per chip) and reuses one compiled
    program across rounds AND across calls."""
    from ich_tpu.parallel import sharded_inference as si
    from ich_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:8], axis_names=("data",))
    net = UNet(depth=2, ndim=3, top_filter=4, p_dropout=0.0, norm="group")
    tr = UNet3D(net, patch_size=(8, 16, 16), n_epoch=1, batch_size=2, lr=1e-3,
                loss_fn="BinaryDiceLoss", loss_fn_kwargs={"reduction": "mean"},
                sw_batch_size=4, mesh=mesh)
    tr._ensure_state((8, 16, 16), steps_per_epoch=1)
    vols = [np.transpose(synthetic_ich_volume(size=16, depth=8, seed=s)[0],
                         (2, 0, 1)) for s in range(10)]  # 10 > 8 devices
    singles = [tr.segment_volume(v, window=(50, 200)) for v in vols[:3]]

    si._VP_CACHE.clear()
    outs = tr.segment_volumes(vols, window=(50, 200), return_preds=True)
    assert len(outs) == 10
    for a, b in zip(singles, outs):
        np.testing.assert_array_equal(a, b)
    assert len(si._VP_CACHE) == 1  # both rounds share one program

    entry = next(iter(si._VP_CACHE.values()))
    outs2 = tr.segment_volumes(vols[:9], window=(50, 200), return_preds=True)
    assert len(outs2) == 9
    assert len(si._VP_CACHE) == 1
    assert next(iter(si._VP_CACHE.values()))[1] is entry[1]  # cache hit
