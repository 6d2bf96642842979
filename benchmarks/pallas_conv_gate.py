"""TPU perf gate for the pallas implicit-GEMM conv (ich_tpu.ops.pallas_conv).

Run on the real chip (JAX_PLATFORMS=axon, the image default):

    python benchmarks/pallas_conv_gate.py [--reps 10]

Stage 1: standalone micro-gate at the flagship net's qualifying conv
shapes (64-cube 16->16 headline + the C_out=32 level-2 shapes) —
correctness vs the XLA direct conv, then timing for both (N dispatches,
one scalar fetch: the axon tunnel has no block_until_ready, see CLAUDE.md).
If the kernel wins >= 1.25x, enable it in-net via
``fastconv.set_packing("pallas")`` around the eval apply and re-bench
sliding-window inference (stage 2 lives in bench.py / BENCHMARKS.md).

Decision record: docs/BENCHMARKS.md "lane-bound levels" section.
"""

import argparse
import json
import time

import numpy as np

TPU_PEAK_TFS = 197.0  # bf16 peak of the target chip


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    plat = jax.devices()[0].platform
    if plat not in ("tpu", "axon"):
        raise SystemExit(f"TPU gate must run on the chip (got platform={plat!r})")

    from ich_tpu.ops import pallas_conv

    @jax.jit
    def conv_xla(xi, wi):
        return jax.lax.conv_general_dilated(
            xi, wi, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    @jax.jit
    def conv_xla2d(xi, wi):
        return jax.lax.conv_general_dilated(
            xi, wi, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    conv_pk = jax.jit(pallas_conv.conv3d_same)
    conv_pk2d = jax.jit(pallas_conv.conv2d_same)

    # the flagship nets' qualifying conv shapes (ndim, batch, spatial,
    # ci -> co); the first row is the headline 16->16 64-cube whose speedup
    # is the gate. 2D rows are the supervised flagship's 256^2 top level.
    shapes = [
        (3, args.batch, 64, 16, 16),   # level-1 double convs (dominant cost)
        (3, args.batch, 32, 32, 32),   # level-2 double convs (WTILE=4)
        (3, args.batch, 32, 16, 32),   # level-2 entry conv
        (3, args.batch, 32, 96, 32),   # level-2 decoder concat conv
        (2, 16, 256, 32, 32),          # 2D flagship top level (bs16 256^2)
        (2, 16, 256, 1, 32),           # 2D stem conv
        (2, 16, 256, 64, 32),          # 2D decoder concat conv
        # C_out=64 (wt=2, 3/4-dense — 1.5x ceiling over 50%-lane direct):
        # opt-in in the library; measured here to decide the "pallas64" arm
        (3, args.batch, 16, 32, 64),   # 3D level-3 entry conv (64^3 patch)
        (3, args.batch, 16, 64, 64),   # 3D level-3 double conv
        (2, 16, 64, 32, 64),           # 2D level-3 entry (256^2 flagship)
        (2, 16, 64, 64, 64),           # 2D level-3 double conv
    ]
    pallas_conv.set_enabled_couts(pallas_conv.COUTS)  # gate measures all
    rng = np.random.default_rng(0)
    results = {}
    for nd, b, sp, ci, co in shapes:
        xs = (b,) + (sp,) * nd + (ci,)
        ws = (3,) * nd + (ci, co)
        x = jnp.asarray(rng.uniform(-1, 1, size=xs), jnp.bfloat16)
        wt = jnp.asarray(rng.uniform(-0.2, 0.2, size=ws), jnp.bfloat16)
        if nd == 3:
            assert pallas_conv.qualifies(x.shape, wt.shape)
            pk, ref_fn = conv_pk, conv_xla
        else:
            assert pallas_conv.qualifies2d(x.shape, wt.shape)
            pk, ref_fn = conv_pk2d, conv_xla2d
        tag = f"{sp}^{nd} {ci}->{co} b{b}"

        macs = b * sp ** nd * 3 ** nd * ci * co

        def timeit(name, fn):
            out = fn(x, wt)
            _ = float(out.reshape(-1)[0])  # sync
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = fn(x, wt)
            _ = float(out.reshape(-1)[0])  # executions are in-order; one fetch
            dt = (time.perf_counter() - t0) / args.reps
            tfs = 2 * macs / dt / 1e12
            print(f"[{tag}] {name:12s} {dt * 1e3:8.2f} ms  {tfs:6.1f} TF/s "
                  f"({100 * tfs / TPU_PEAK_TFS:.1f}% peak)", flush=True)
            return dt

        try:  # one Mosaic failure must not lose the other shapes' data
            # correctness (forces the first compile + tunnel warmup too)
            got = pk(x, wt)
            ref = ref_fn(x, wt)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
            scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
            print(f"[{tag}] max err vs XLA bf16: {err:.4f} (ref max {scale:.2f})",
                  flush=True)
            t_pk = timeit("pallas", pk)
            t_xla = timeit("xla direct", ref_fn)
            results[tag] = {"speedup": round(t_xla / t_pk, 3),
                            "pallas_ms": round(t_pk * 1e3, 2),
                            "xla_ms": round(t_xla * 1e3, 2),
                            "max_abs_err": err}
        except Exception as e:  # pragma: no cover - hardware probe
            msg = f"{type(e).__name__}: {e}"[:300]
            print(f"[{tag}] FAILED: {msg}", flush=True)
            results[tag] = {"error": msg}

    head = results.get(f"64^3 16->16 b{args.batch}", {})
    print(json.dumps({
        "metric": "pallas_conv_speedup_vs_xla",
        "value": head.get("speedup", 0.0),
        "unit": "x",
        "pallas_ms": head.get("pallas_ms"),
        "xla_ms": head.get("xla_ms"),
        "max_abs_err": head.get("max_abs_err"),
        "per_shape": results,
    }))


if __name__ == "__main__":
    main()
