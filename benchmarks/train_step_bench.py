"""Training-step benchmark: ms/step, slices|patches/s, and MFU for the two
flagship training workloads (BASELINE "epoch time" metric):

- 2D supervised: batch 16 x 256^2, depth-5 top-32 U-Net, BatchNorm,
  dropout 0.5, Dice loss, fused-affine augmentation (the reference's
  ``UNet2D_config.json`` shape; docs/BENCHMARKS.md "Supervised train step").
- 3D patch training (BASELINE config 2): 128^3 patches through the depth-4
  top-16 3D U-Net with on-device 3D augmentation, plus the 64^3 shape for
  comparison.

Timing amortizes the ~34 ms axon tunnel fetch by dispatching N steps and
fetching one scalar at the end (device executions are in-order). MFU =
XLA cost-analysis FLOPs of the jitted step / time / dense-bf16 peak.

Run (real TPU, exclusive):  python benchmarks/train_step_bench.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_steps(step, state, imgs, masks, key, n=20):
    """Seconds/step, pipelined. `step` donates state, so thread it."""
    import jax

    st = state
    st, loss = step(st, imgs, masks, key)
    _ = float(loss)  # compile + sync
    t0 = time.perf_counter()
    for i in range(n):
        st, loss = step(st, imgs, masks, jax.random.fold_in(key, i))
    _ = float(loss)  # one fetch syncs the in-order queue
    return (time.perf_counter() - t0) / n


def step_flops(step, *args):
    from ich_tpu.utils.profiling import compiled_flops

    return compiled_flops(step, *args)


def bench_2d(peak, batch=16):
    import jax
    import jax.numpy as jnp

    from ich_tpu.experiments.supervised2d import build_augment_fn
    from ich_tpu.models.unet import UNet
    from ich_tpu.train.segmentation2d import UNet2D

    net = UNet(depth=5, ndim=2, top_filter=32, midchannels_factor=2,
               p_dropout=0.5, norm="batch", dtype=jnp.bfloat16)
    augment = build_augment_fn({
        "Translate": {"low": -0.1, "high": 0.1},
        "Rotate": {"low": -10, "high": 10},
        "Scale": {"low": 0.9, "high": 1.1},
        "HFlip": {},
    })
    tr = UNet2D(net, n_epoch=1, batch_size=batch, lr=1e-3, loss_fn="BinaryDiceLoss",
                loss_fn_kwargs={"reduction": "mean"}, augment_fn=augment)
    tr._ensure_state((256, 256), steps_per_epoch=100)
    step = tr._make_train_step()
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(batch, 256, 256)).astype(np.float32))
    masks = jnp.asarray((rng.uniform(size=(batch, 256, 256)) > 0.98).astype(np.float32))
    key = jax.random.PRNGKey(0)
    flops = step_flops(step, tr.state, imgs, masks, key)
    dt = time_steps(step, tr.state, imgs, masks, key)
    entry = {"ms_per_step": round(dt * 1e3, 2),
             "slices_per_s": round(batch / dt, 1)}
    if flops is not None:
        entry["tflops"] = round(flops / dt / 1e12, 2)
        if peak:
            entry["mfu_pct"] = round(100 * flops / dt / 1e12 / peak, 2)
    return entry


def bench_3d(peak, patch, batch, remat=False, aug=True, top_filter=16):
    import jax
    import jax.numpy as jnp

    from ich_tpu.models.unet import UNet
    from ich_tpu.ops.transforms3d import default_patch_augmentation
    from ich_tpu.train.segmentation3d import UNet3D

    # remat: bs2 x 128^3 stored activations exceed v5e HBM without
    # per-block gradient checkpointing (UNet(remat=True)); 64^3 fits plain.
    # top_filter=64 is the wide MFU *control*: every lane-fill transform is
    # a measured negative (docs/BENCHMARKS.md), so the remaining question
    # is whether low MFU is the framework or the reference architecture —
    # a C_out>=64 net through the identical step answers it.
    net = UNet(depth=4, ndim=3, top_filter=top_filter, midchannels_factor=1,
               p_dropout=0.0, norm="group", remat=remat, dtype=jnp.bfloat16)
    tr = UNet3D(net, patch_size=(patch,) * 3, n_epoch=1, batch_size=batch,
                lr=1e-3, loss_fn="BinaryDiceLoss",
                loss_fn_kwargs={"reduction": "mean"},
                augment_fn=default_patch_augmentation() if aug else None)
    tr._ensure_state((patch, patch, patch), steps_per_epoch=100)
    step = tr._make_train_step()
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(batch,) + (patch,) * 3).astype(np.float32))
    masks = jnp.asarray(
        (rng.uniform(size=(batch,) + (patch,) * 3) > 0.995).astype(np.float32))
    key = jax.random.PRNGKey(0)
    flops = step_flops(step, tr.state, imgs, masks, key)
    dt = time_steps(step, tr.state, imgs, masks, key, n=10)
    entry = {"ms_per_step": round(dt * 1e3, 2),
             "patches_per_s": round(batch / dt, 2),
             "voxels_per_s_M": round(batch * patch ** 3 / dt / 1e6, 1)}
    if flops is not None:
        entry["tflops"] = round(flops / dt / 1e12, 2)
        if peak:
            entry["mfu_pct"] = round(100 * flops / dt / 1e12 / peak, 2)
    return entry


def bench_sampler(patch, batch):
    """Host sample_patches vs the HBM-resident DevicePatchSampler, per
    batch (the host path moves ~2*B*patch^3*4 bytes through numpy)."""
    import jax
    import jax.numpy as jnp

    from ich_tpu.data.core import VolumeDataset3D
    from ich_tpu.data.patch_sampler import DevicePatchSampler
    from ich_tpu.train.segmentation3d import sample_patches

    rng = np.random.default_rng(0)
    vols = [rng.uniform(size=(64, 256, 256)).astype(np.float32) for _ in range(4)]
    msks = [(rng.uniform(size=(64, 256, 256)) > 0.999).astype(np.float32)
            for _ in range(4)]
    ds = VolumeDataset3D(vols, msks, np.arange(4))

    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        imgs, m = sample_patches(rng, ds, batch, (patch,) * 3, 0.5)
        _ = float(jnp.asarray(imgs)[0, 0, 0, 0])  # include the device upload
    host_ms = (time.perf_counter() - t0) / n * 1e3

    samp = DevicePatchSampler(ds, (patch,) * 3, 0.5)
    key = jax.random.PRNGKey(0)
    imgs, m = samp(key, batch)
    _ = float(imgs[0, 0, 0, 0])
    t0 = time.perf_counter()
    for i in range(n):
        imgs, m = samp(jax.random.fold_in(key, i), batch)
    _ = float(imgs[0, 0, 0, 0])
    dev_ms = (time.perf_counter() - t0) / n * 1e3
    return {"host_ms_per_batch": round(host_ms, 2),
            "device_ms_per_batch": round(dev_ms, 2),
            "speedup": round(host_ms / max(dev_ms, 1e-9), 1)}


def bench_gan(peak, batch=32, remat=False):
    """SN-PatchGAN combined G+D hinge step at the reference's shapes
    (256^2, batch 32, gated generator w/ contextual attention, SN patch
    discriminator — ``SNPatchGAN_config.json``). ``remat=True``
    gradient-checkpoints every gated conv + the attention (the (B, P, L)
    similarity is the largest retained temp), unlocking batches the plain
    step OOMs at (bs64 exceeds HBM without it, round-3 probe)."""
    import jax
    import jax.numpy as jnp

    from ich_tpu.models.inpainting import GatedGenerator, PatchDiscriminator
    from ich_tpu.train.gan import SNPatchGAN

    g = GatedGenerator(dtype=jnp.bfloat16, remat=remat)
    d = PatchDiscriminator(dtype=jnp.bfloat16)
    tr = SNPatchGAN(g, d, n_epoch=1, batch_size=batch, lr_g=1e-3, lr_d=1e-3)
    tr._ensure_state((256, 256), steps_per_epoch=100)
    step = tr._make_train_step()
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(batch, 256, 256)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    flops = step_flops(step, tr.state, imgs, key)

    st = tr.state
    st, losses = step(st, imgs, key)
    _ = float(losses[0])
    t0 = time.perf_counter()
    n = 10
    for i in range(n):
        st, losses = step(st, imgs, jax.random.fold_in(key, i))
    _ = float(losses[0])
    dt = (time.perf_counter() - t0) / n
    entry = {"ms_per_step": round(dt * 1e3, 2),
             "images_per_s": round(batch / dt, 1)}
    if flops is not None:
        entry["tflops"] = round(flops / dt / 1e12, 2)
        if peak:
            entry["mfu_pct"] = round(100 * flops / dt / 1e12 / peak, 2)
    return entry


def _time_fn(fn, *args, n=10):
    """Seconds/call, pipelined: dispatch n calls and fetch one scalar at the
    end (device executions are in-order; fetch ≈34 ms amortized away)."""
    import jax.numpy as jnp

    def scalar(out):
        leaf = jax.tree_util.tree_leaves(out)[0] if not hasattr(out, "ravel") else out
        return float(jnp.ravel(leaf)[0])

    import jax

    scalar(fn(*args))  # compile + sync
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    scalar(out)
    return (time.perf_counter() - t0) / n


def bench_gan_parts(peak):
    """Per-component attribution of the SN-PatchGAN step (forward passes in
    eval mode — BN stats frozen; relative costs carry over): generator with
    and without the contextual-attention branch, the attention module alone
    at its in-net shape (B=32, 64², C=128), the SN patch discriminator, the
    DiscountedL1 distance-map (Pallas EDT), and G/D fwd+bwd probes."""
    import jax
    import jax.numpy as jnp

    from ich_tpu.models.inpainting import (
        ContextualAttention, GatedGenerator, PatchDiscriminator)
    from ich_tpu.ops.losses import discounted_l1_loss
    from ich_tpu.ops.masks import random_ff_masks

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(32, 256, 256, 1)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    masks = random_ff_masks(key, 32, (256, 256))[..., None].astype(jnp.float32)

    out = {}
    for name, attn in (("g_fwd_full", True), ("g_fwd_no_attention", False)):
        g = GatedGenerator(dtype=jnp.bfloat16, context_attention=attn)
        gv = g.init(key, imgs[:1], masks[:1], train=False)
        f = jax.jit(lambda v, i, m: g.apply(v, i, m, train=False)[0])
        out[name] = round(_time_fn(f, gv, imgs, masks) * 1e3, 2)

    ca = ContextualAttention()
    feat = jnp.asarray(rng.uniform(size=(32, 64, 64, 128)), jnp.bfloat16)
    cv = ca.init(key, feat[:1], feat[:1])
    fca = jax.jit(lambda v, x, m: ca.apply(v, x, x, mask=m))
    out["ctx_attention_module"] = round(_time_fn(fca, cv, feat, masks) * 1e3, 2)

    d = PatchDiscriminator(dtype=jnp.bfloat16)
    dv = d.init(key, imgs[:1], masks[:1])
    fd = jax.jit(lambda v, i, m: d.apply(v, i, m))
    out["d_fwd"] = round(_time_fn(fd, dv, imgs, masks) * 1e3, 2)

    fl = jax.jit(lambda a, b, m: discounted_l1_loss(a, b, m))
    out["discounted_l1_edt"] = round(
        _time_fn(fl, imgs, imgs * 0.9, masks) * 1e3, 2)

    # fwd+bwd probes (L1 objective; optimizer excluded)
    g = GatedGenerator(dtype=jnp.bfloat16)
    gv = g.init(key, imgs[:1], masks[:1], train=False)
    gb = jax.jit(lambda v, i, m: jax.grad(
        lambda vv: jnp.abs(g.apply(vv, i, m, train=False)[0] - i).mean()
    )(v))
    out["g_fwd_bwd"] = round(_time_fn(gb, gv, imgs, masks) * 1e3, 2)
    db = jax.jit(lambda v, i, m: jax.grad(
        lambda vv: d.apply(vv, i, m).mean())(v))
    out["d_fwd_bwd"] = round(_time_fn(db, dv, imgs, masks) * 1e3, 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-3d", action="store_true")
    ap.add_argument("--skip-gan", action="store_true")
    ap.add_argument("--only", default=None,
                    help="run only jobs whose name contains this substring")
    ap.add_argument("--parts", action="store_true",
                    help="component attribution (GAN parts + 3D no-augment) "
                         "instead of the headline step table")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ich_tpu.utils.profiling import peak_tflops

    float(jnp.ones(()).sum())  # tunnel warmup
    peak = peak_tflops(jax.devices()[0].device_kind)
    out = {"device": jax.devices()[0].device_kind, "peak_bf16_tflops": peak}
    if args.parts:
        jobs = [("gan_parts", lambda: bench_gan_parts(peak)),
                ("train3d_bs8_64_noaug", lambda: bench_3d(peak, 64, 8, aug=False)),
                ("train3d_bs8_64", lambda: bench_3d(peak, 64, 8))]
        for name, fn in jobs:
            try:
                out[name] = fn()
            except Exception as e:
                out[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(name, json.dumps(out[name]), flush=True)
        print(json.dumps(out))
        return
    jobs = [("train2d_bs16_256", lambda: bench_2d(peak)),
            # throughput-optimal batch (saturates ~28% MFU; round-3 probe:
            # bs16/32/64/128/256 -> 390/420/599/934/925 slices/s)
            ("train2d_bs128_256", lambda: bench_2d(peak, batch=128))]
    if not args.skip_3d:
        jobs += [("train3d_bs8_64", lambda: bench_3d(peak, 64, 8)),
                 # throughput-optimal batch (2.7x the bs8 Mvox/s, round-3
                 # scaling probe) — the BASELINE-parity shapes stay above
                 ("train3d_bs64_64", lambda: bench_3d(peak, 64, 64)),
                 ("train3d_bs2_128_remat", lambda: bench_3d(peak, 128, 2, remat=True)),
                 # wide MFU control (C 64..512): is low MFU the framework
                 # or the reference's C_out<=32 architecture?
                 ("train3d_bs8_64_wide64",
                  lambda: bench_3d(peak, 64, 8, remat=True, top_filter=64)),
                 ("sampler3d_bs2_128", lambda: bench_sampler(128, 2))]
    if not args.skip_gan:
        jobs.append(("gan_bs32_256", lambda: bench_gan(peak)))
        # remat unlocks bs64 (plain OOMs); keep bs32 as the parity config
        jobs.append(("gan_bs64_256_remat",
                     lambda: bench_gan(peak, batch=64, remat=True)))
    if args.only:
        jobs = [(n, f) for n, f in jobs if args.only in n]
    for name, fn in jobs:
        try:
            out[name] = fn()
        except Exception as e:  # one workload must not lose the others
            out[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(name, json.dumps(out[name]), flush=True)  # incremental
    print(json.dumps(out))


if __name__ == "__main__":
    main()
