"""Wide-U-Net serving extension probe (round-5; follows round-4's finding
that the reference architectures' MFU ceiling is channel width, not the
framework — every lane-fill transform was a measured negative and the MFU
control at top_filter 64 confirmed the width lever in training).

Measures the headline sliding-window serving workload (64x512x512 CT,
64^3 patches, 0.5 overlap, coset chunking) at top_filter 16 (reference
parity, = bench.py headline) vs 32 and 64 (the "wide serving" extension a
user would pick for stronger models): vol/s latency + pipelined + MFU per
width. Run exclusive on the TPU:
    python benchmarks/wide_serving_probe.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(widths=(16, 32, 64), n_iters=5):
    import jax
    import jax.numpy as jnp

    from ich_tpu.models import UNet
    from ich_tpu.ops import ct, fastconv
    from ich_tpu.ops.sliding_window import patch_grid, sliding_window_inference
    from ich_tpu.utils.profiling import compiled_flops, peak_tflops

    if jax.devices()[0].platform == "cpu":
        print(json.dumps({"error": "refusing to run the TPU probe on CPU"}))
        return

    d, h, w = 64, 512, 512
    rng = np.random.default_rng(0)
    vol_hu = jnp.asarray(rng.uniform(-100, 150, size=(d, h, w)).astype(np.float32))
    float(jnp.ones(()).sum())  # tunnel warmup
    peak = peak_tflops(jax.devices()[0].device_kind)

    results = {}
    for tf_ in widths:
        net = UNet(depth=4, ndim=3, top_filter=tf_, p_dropout=0.0,
                   norm="group", dtype=jnp.bfloat16)
        variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 64, 1)))

        def apply_fn(v, x):
            return net.apply(v, x, train=False)

        def run(vol):
            x = ct.window_ct(vol, 50, 200)
            return sliding_window_inference(
                apply_fn, variables, x,
                patch_size=(64,) * 3, overlap=0.5, batch_size=128,
            )

        def sync(out):
            return float(out[0, 0, 0, 0])

        sync(run(vol_hu))  # compile
        sync(run(vol_hu))
        t0 = time.perf_counter()
        for _ in range(n_iters):
            sync(run(vol_hu))
        lat = (time.perf_counter() - t0) / n_iters
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iters):
            out = run(vol_hu)
        sync(out)
        thr = (time.perf_counter() - t0) / n_iters

        prev = fastconv._MODE
        fastconv.set_packing("off")
        try:
            per_batch = compiled_flops(
                jax.jit(apply_fn), variables, jnp.zeros((128, 64, 64, 64, 1)))
        finally:
            fastconv.set_packing(prev)
        n_patches = 1
        for dim in (d, h, w):
            n_patches *= len(patch_grid(max(dim, 64), 64, 32))
        entry = {"volumes_per_s": round(1 / lat, 3),
                 "volumes_per_s_pipelined": round(1 / thr, 3)}
        if per_batch is not None:
            tflops = per_batch / 128 * n_patches / thr / 1e12
            entry["tflops"] = round(tflops, 2)
            if peak:
                entry["mfu_pct"] = round(100 * tflops / peak, 2)
        results[f"top{tf_}"] = entry
        print(json.dumps({f"top{tf_}": entry}), flush=True)
    print(json.dumps({"wide_serving_probe": results}))


if __name__ == "__main__":
    main()
