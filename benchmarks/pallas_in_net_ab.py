"""Stage-2 A/B for the pallas implicit-GEMM conv: full sliding-window
inference (bench.py's flagship 64-cube workload) with ``fastconv`` packing
"auto" (XLA direct convs) vs "pallas" (implicit-GEMM on the qualifying
C_out∈{8,16,32} levels) vs "pallas64" (also the half-lane C_out=64 levels).

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

# Each arm is (fastconv packing mode, pallas enabled C_out set) — the
# couts come from pallas_conv's own constants so the arm named "pallas64"
# here always means the same enabled set as bench.py's arm of that name.
# "pallas64" additionally routes the half-lane co=64 levels through the
# kernel (wt=2, 3/4-dense packed weights — 1.5x ceiling); it is
# default-off in the library pending this gate. Memoized programs key on
# packing_key(), which folds the couts set in, so arms never share a
# stale executable.
ARMS = ("auto", "pallas", "pallas64")
# train-only extra arm: GN prologue/epilogue fusion applied to the train
# forward too (fastconv.set_fuse_train — identical math, custom-VJP grads)
TRAIN_ARMS = ARMS + ("pallas_ft",)


def _set_arm(tag: str) -> None:
    from ich_tpu.ops import fastconv, pallas_conv

    fastconv.set_packing("auto" if tag == "auto" else "pallas")
    pallas_conv.set_enabled_couts(
        pallas_conv.COUTS if tag == "pallas64" else pallas_conv.DEFAULT_COUTS)
    fastconv.set_fuse_train(tag == "pallas_ft")


def _reset_arm() -> None:
    from ich_tpu.ops import fastconv, pallas_conv

    fastconv.set_packing("auto")
    pallas_conv.set_enabled_couts(pallas_conv.DEFAULT_COUTS)
    fastconv.set_fuse_train(False)


def _emit_json(metric: str, results: dict) -> None:
    """One machine-readable line whenever auto plus ANY kernel arm
    succeeded — a Mosaic failure in one arm must not discard the others'
    measurements."""
    base = results.get("auto")
    others = {k: v for k, v in results.items() if k != "auto"}
    if base is None or not others:
        return
    ref = others.get("pallas", next(iter(others.values())))
    print(json.dumps({
        "metric": metric,
        "value": round(base / ref, 3),
        "unit": "x",
        "arms_ms": {k: round(v * 1e3, 1) for k, v in results.items()},
        **{f"{k}_speedup": round(base / v, 3) for k, v in others.items()},
    }))


def train_ab(reps: int) -> None:
    """3D train-step A/B (bs8 64^3, the BENCHMARKS.md parity config): the
    custom VJP routes the input grads through the kernel too, so "pallas"
    now covers the training path. Separate from the inference A/B because
    the step includes augmentation + loss + optimizer."""
    import jax
    import jax.numpy as jnp

    from ich_tpu.models import UNet
    from ich_tpu.ops import fastconv  # noqa: F401 (arm helpers own the mode)
    from ich_tpu.train import UNet3D

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(8, 64, 64, 64)).astype(np.float32))
    msks = jnp.asarray((rng.uniform(size=(8, 64, 64, 64)) > 0.995).astype(np.float32))
    key = jax.random.PRNGKey(0)
    results = {}
    for mode in TRAIN_ARMS:
        _set_arm(mode)
        try:
            # identical to train_step_bench.bench_3d(64, 8, aug=True) so the
            # "auto" arm reproduces the BENCHMARKS.md 78.8 ms row
            from ich_tpu.ops.transforms3d import default_patch_augmentation

            net = UNet(depth=4, ndim=3, top_filter=16, midchannels_factor=1,
                       p_dropout=0.0, norm="group", dtype=jnp.bfloat16)
            tr = UNet3D(net, patch_size=(64,) * 3, n_epoch=1, batch_size=8,
                        lr=1e-3, loss_fn="BinaryDiceLoss",
                        loss_fn_kwargs={"reduction": "mean"},
                        augment_fn=default_patch_augmentation())
            tr._ensure_state((64,) * 3, steps_per_epoch=100)
            step = tr._make_train_step()
            st, loss = step(tr.state, imgs, msks, key)
            _ = float(loss)
            t0 = time.perf_counter()
            for i in range(reps):
                st, loss = step(st, imgs, msks, jax.random.fold_in(key, i))
            _ = float(loss)
            dt = (time.perf_counter() - t0) / reps
            results[mode] = dt
            print(f"train {mode:8s} {dt * 1e3:8.1f} ms/step", flush=True)
        except Exception as e:  # pragma: no cover - hardware probe
            print(f"train {mode:8s} FAILED: {type(e).__name__}: {e}", flush=True)
        finally:
            _reset_arm()
    _emit_json("pallas_train_step_speedup", results)


def train2d_ab(reps: int) -> None:
    """2D train-step A/B at the flagship config (bs16 256^2 depth-5 top-32
    BN dropout .5 Dice + fused-affine aug — the 40.1 ms BENCHMARKS.md row).
    The 2D kernel covers the 256^2 C=32 top-level convs."""
    import jax
    import jax.numpy as jnp

    from ich_tpu.experiments.supervised2d import build_augment_fn
    from ich_tpu.models import UNet
    from ich_tpu.ops import fastconv  # noqa: F401 (arm helpers own the mode)
    from ich_tpu.train import UNet2D

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(16, 256, 256)).astype(np.float32))
    msks = jnp.asarray((rng.uniform(size=(16, 256, 256)) > 0.98).astype(np.float32))
    key = jax.random.PRNGKey(0)
    results = {}
    for mode in ARMS:
        _set_arm(mode)
        try:
            # identical to train_step_bench.bench_2d so the "auto" arm
            # reproduces the BENCHMARKS.md 40.1 ms flagship row
            net = UNet(depth=5, ndim=2, top_filter=32, midchannels_factor=2,
                       p_dropout=0.5, norm="batch", dtype=jnp.bfloat16)
            augment = build_augment_fn({
                "Translate": {"low": -0.1, "high": 0.1},
                "Rotate": {"low": -10, "high": 10},
                "Scale": {"low": 0.9, "high": 1.1},
                "HFlip": {},
            })
            tr = UNet2D(net, n_epoch=1, batch_size=16, lr=1e-3,
                        loss_fn="BinaryDiceLoss",
                        loss_fn_kwargs={"reduction": "mean"},
                        augment_fn=augment)
            tr._ensure_state((256, 256), steps_per_epoch=100)
            step = tr._make_train_step()
            st, loss = step(tr.state, imgs, msks, key)
            _ = float(loss)
            t0 = time.perf_counter()
            for i in range(reps):
                st, loss = step(st, imgs, msks, jax.random.fold_in(key, i))
            _ = float(loss)
            dt = (time.perf_counter() - t0) / reps
            results[mode] = dt
            print(f"train2d {mode:8s} {dt * 1e3:8.1f} ms/step", flush=True)
        except Exception as e:  # pragma: no cover - hardware probe
            print(f"train2d {mode:8s} FAILED: {type(e).__name__}: {e}", flush=True)
        finally:
            _reset_arm()
    _emit_json("pallas_train2d_step_speedup", results)


def infer2d_ab(reps: int) -> None:
    """2D eval-forward A/B at the throughput config (bs128 256^2, the 934
    slices/s BENCHMARKS.md row). BatchNorm folds to a constant affine at
    eval, so this isolates the plain 2D kernel on the co=32 (and, in the
    pallas64 arm, co=64) levels."""
    import jax
    import jax.numpy as jnp

    from ich_tpu.models import UNet

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(128, 256, 256, 1)).astype(np.float32))
    net = UNet(depth=5, ndim=2, top_filter=32, midchannels_factor=2,
               p_dropout=0.5, norm="batch", dtype=jnp.bfloat16)
    v = net.init(jax.random.PRNGKey(0), x[:1])
    results = {}
    for mode in ARMS:
        _set_arm(mode)
        try:
            fwd = jax.jit(lambda xi: net.apply(v, xi, train=False))
            out = fwd(x)
            _ = float(out.reshape(-1)[0])  # compile + sync
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fwd(x)
            _ = float(out.reshape(-1)[0])
            dt = (time.perf_counter() - t0) / reps
            results[mode] = dt
            print(f"infer2d {mode:8s} {dt * 1e3:8.1f} ms/batch "
                  f"({128 / dt:.0f} slices/s)", flush=True)
        except Exception as e:  # pragma: no cover - hardware probe
            print(f"infer2d {mode:8s} FAILED: {type(e).__name__}: {e}", flush=True)
        finally:
            _reset_arm()
    _emit_json("pallas_infer2d_speedup", results)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--train", action="store_true",
                    help="A/B the 3D train step instead of sliding-window inference")
    ap.add_argument("--train2d", action="store_true",
                    help="A/B the 2D flagship train step")
    ap.add_argument("--infer2d", action="store_true",
                    help="A/B the 2D bs128 eval forward (throughput row)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    plat = jax.devices()[0].platform
    if plat not in ("tpu", "axon"):
        raise SystemExit(f"A/B must run on the chip (got platform={plat!r})")

    if args.train:
        train_ab(args.reps)
        return
    if args.train2d:
        train2d_ab(args.reps)
        return
    if args.infer2d:
        infer2d_ab(args.reps)
        return

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
    for mode in ARMS:
        _set_arm(mode)
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
            _reset_arm()

    for tag in ("pallas", "pallas64"):
        if "auto" in outs and tag in outs:
            diff = float(jnp.max(jnp.abs(
                outs["auto"].astype(jnp.float32) - outs[tag].astype(jnp.float32))))
            print(f"max |auto - {tag}| on the fused volume: {diff:.4f}", flush=True)

    _emit_json("pallas_in_net_speedup", results)


if __name__ == "__main__":
    main()
