import pytest
import os

import numpy as np

from ich_tpu.data import synthetic_ich_slices
from ich_tpu.models import UNet
from ich_tpu.train.segmentation2d import UNet2D
from ich_tpu.utils import preemption

pytestmark = pytest.mark.slow  # end-to-end: excluded from the fast subset



def test_preemption_checkpoints_and_stops(tmp_path):
    data = synthetic_ich_slices(n_slices=16, size=32, n_volumes=2, seed=0)
    t = UNet2D(UNet(depth=3, top_filter=4, p_dropout=0.0), n_epoch=50,
               batch_size=8, lr=1e-3, checkpoint_freq=100)
    path = str(tmp_path / "ckpt.bin")
    preemption._requested.set()  # simulate SIGTERM delivered mid-epoch-1
    try:
        t.train(data, checkpoint_path=path)
    finally:
        preemption.reset()
    # stopped after the first epoch and wrote a checkpoint despite freq=100
    assert len(t.outputs["train"]["evolution"]) == 1
    assert os.path.exists(path)

    # resume continues from epoch 1
    t2 = UNet2D(UNet(depth=3, top_filter=4, p_dropout=0.0), n_epoch=3,
                batch_size=8, lr=1e-3, checkpoint_freq=100)
    t2.train(data, checkpoint_path=path)
    assert [h[0] for h in t2.outputs["train"]["evolution"]] == [1, 2, 3]
