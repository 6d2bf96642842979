"""Stage-2 A/B for the pallas implicit-GEMM conv: full sliding-window
inference (bench.py's flagship 64-cube workload) with ``fastconv`` packing
"auto" (XLA direct convs) vs "pallas" (implicit-GEMM on the qualifying
C_out∈{8,16,32} levels).

Run on the real chip after the stage-1 micro-gate
(benchmarks/pallas_conv_gate.py) wins >= 1.25x:

    python benchmarks/pallas_in_net_ab.py [--reps 3]

Workload identical to bench.py: 64 x 512 x 512 HU volume, window_ct,
3D U-Net depth-4 top-16 bf16 group-norm, 64-cube patches, overlap 0.5,
batch 128. Decision record: docs/BENCHMARKS.md "lane-bound levels".
"""

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    plat = jax.devices()[0].platform
    if plat not in ("tpu", "axon"):
        raise SystemExit(f"A/B must run on the chip (got platform={plat!r})")

    from ich_tpu.models import UNet
    from ich_tpu.ops import ct, fastconv
    from ich_tpu.ops.sliding_window import sliding_window_inference

    net = UNet(depth=4, ndim=3, top_filter=16, p_dropout=0.0,
               norm="group", dtype=jnp.bfloat16)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 64, 1)))

    def apply_fn(v, x):
        return net.apply(v, x, train=False)

    rng = np.random.default_rng(0)
    vol_hu = jnp.asarray(rng.uniform(-100, 150, size=(64, 512, 512)).astype(np.float32))

    def run(vol):
        v = ct.window_ct(vol, 50, 200)
        return sliding_window_inference(
            apply_fn, variables, v,
            patch_size=(64,) * 3, overlap=0.5, batch_size=128)

    def sync(out):
        return float(out[0, 0, 0, 0])  # scalar fetch = only sync on axon

    results = {}
    outs = {}
    for mode in ("auto", "pallas"):
        fastconv.set_packing(mode)
        try:
            outs[mode] = run(vol_hu)
            sync(outs[mode])  # compile + warm
            t0 = time.perf_counter()
            for _ in range(args.reps):
                o = run(vol_hu)
            sync(o)
            dt = (time.perf_counter() - t0) / args.reps
            results[mode] = dt
            print(f"{mode:8s} {dt * 1e3:8.1f} ms/vol  {1 / dt:.2f} vol/s", flush=True)
        except Exception as e:  # pragma: no cover - hardware probe
            print(f"{mode:8s} FAILED: {type(e).__name__}: {e}", flush=True)
        finally:
            fastconv.set_packing("auto")

    if "auto" in outs and "pallas" in outs:
        diff = float(jnp.max(jnp.abs(
            outs["auto"].astype(jnp.float32) - outs["pallas"].astype(jnp.float32))))
        print(f"max |auto - pallas| on the fused volume: {diff:.4f}", flush=True)

    if len(results) == 2:
        print(json.dumps({
            "metric": "pallas_in_net_speedup",
            "value": round(results["auto"] / results["pallas"], 3),
            "unit": "x",
            "auto_ms": round(results["auto"] * 1e3, 1),
            "pallas_ms": round(results["pallas"] * 1e3, 1),
        }))


if __name__ == "__main__":
    main()
