"""Headline benchmark: CT volumes/sec/chip, Gaussian-blended sliding-window
full-volume inference (the BASELINE.json north-star metric).

Workload: one preprocessed head CT (64 x 512 x 512 voxels ~ (2.5, 1, 1) mm
spacing), HU windowing + 64^3 patches at 0.5 overlap through a depth-4
top-16 3D U-Net (GroupNorm, bf16 conv compute), blended on device — no host
round-trips.

vs_baseline: the reference implements this pipeline in PyTorch
(slice-batching through the host; its repo publishes no numbers —
BASELINE.md). The baseline constant below was measured on this machine with
an architecture-identical torch (CPU) model and the same patch grid /
blending loop (the reference's GPUs are not available here):
225 patches, 183.7 s/volume = 0.00544 volumes/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

TORCH_CPU_BASELINE_VOLS_PER_S = 0.00544  # see module docstring


def main():
    import jax
    import jax.numpy as jnp

    from ich_tpu.models import UNet
    from ich_tpu.ops import ct
    from ich_tpu.ops.sliding_window import sliding_window_inference

    net = UNet(
        depth=4, ndim=3, top_filter=16, p_dropout=0.0,
        norm="group", dtype=jnp.bfloat16,
    )
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 64, 1)))

    def apply_fn(v, x):
        return net.apply(v, x, train=False)

    d, h, w = 64, 512, 512
    rng = np.random.default_rng(0)
    vol_hu = jnp.asarray(rng.uniform(-100, 150, size=(d, h, w)).astype(np.float32))

    def run(vol_hu):
        vol = ct.window_ct(vol_hu, 50, 200)
        out = sliding_window_inference(
            apply_fn, variables, vol,
            patch_size=(64, 64, 64), overlap=0.5, batch_size=64,
        )
        # On this image's tunneled TPU platform block_until_ready does NOT
        # synchronize; a (4-byte) scalar fetch is the only reliable barrier.
        return float(out[0, 0, 0, 0])

    # tunnel + compile warmup (first fetch in a process is minutes on axon)
    float(jnp.ones(()).sum())
    run(vol_hu)
    run(vol_hu)

    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        run(vol_hu)
    dt = (time.perf_counter() - t0) / n_iters
    vols_per_s = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "ct_volumes_per_sec_per_chip_sliding_window",
                "value": round(vols_per_s, 4),
                "unit": "volumes/s (64x512x512 CT, 64^3 patches, 0.5 overlap, 3D U-Net d4f16)",
                "vs_baseline": round(vols_per_s / TORCH_CPU_BASELINE_VOLS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
