"""Per-stage profile of the contextual-attention block at the GAN's refine
shape (VERDICT r3 item 6: are the CA einsums kernel-amenable?).

The block (``ich_tpu.models.inpainting.ContextualAttention``) is two big
einsums — similarity (B,P,D)x(B,L,D) and reconstruction (B,P,L)x(B,L,D) —
around patch extraction, a softmax, and an overlap-add. This times, at the
SN-PatchGAN refine-branch shape (bs32, 64^2, C=128, 3^2 patches):

  1. the full block, fwd and fwd+bwd,
  2. the einsum+softmax core alone (on pre-extracted patches),
  3. extraction + overlap-add alone,

with the algorithmic einsum TF/s, so the "hand-write a kernel?" question
gets a measured answer: if the core already runs near the matmul roofline
and dominates the block, there is nothing for a kernel to win.

Run on the real chip: python benchmarks/ca_profile.py
"""

import json
import time

import numpy as np

TPU_PEAK_TFS = 197.0


def main():
    import jax
    import jax.numpy as jnp

    plat = jax.devices()[0].platform
    if plat not in ("tpu", "axon"):
        raise SystemExit(f"must run on the chip (got platform={plat!r})")

    from ich_tpu.models.inpainting import ContextualAttention, _extract_patches

    b, hw, c, ks = 32, 64, 128, 3
    rng = np.random.default_rng(0)
    fg = jnp.asarray(rng.normal(size=(b, hw, hw, c)), jnp.bfloat16)
    bg = jnp.asarray(rng.normal(size=(b, hw, hw, c)), jnp.bfloat16)
    mask = jnp.asarray(rng.uniform(size=(b, hw, hw)) < 0.25, jnp.float32)

    ca = ContextualAttention(kernel_size=ks, patch_stride=1)
    variables = ca.init(jax.random.PRNGKey(0), fg, bg, mask)

    def sync(x):
        return float(jnp.asarray(x).reshape(-1)[0])

    def timeit(name, fn, *args, reps=10):
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        sync(out)  # executions are in-order; one fetch
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:28s} {dt * 1e3:8.2f} ms", flush=True)
        return dt * 1e3

    res = {"shape": f"b{b} {hw}^2 c{c} k{ks}"}

    # 1. full block
    full = jax.jit(lambda f, g, m: ca.apply(variables, f, g, m))
    res["full_fwd_ms"] = timeit("full CA fwd", full, fg, bg, mask)
    grad = jax.jit(jax.grad(
        lambda f, g, m: jnp.sum(ca.apply(variables, f, g, m)
                                .astype(jnp.float32)), argnums=(0, 1)))
    res["full_fwdbwd_ms"] = timeit("full CA fwd+bwd", grad, fg, bg, mask)

    # 2. einsum + softmax core on pre-extracted patches
    P = L = hw * hw
    D = ks * ks * c
    fgp = jnp.asarray(rng.normal(size=(b, P, D)), jnp.bfloat16)
    wn = jnp.asarray(rng.normal(size=(b, L, D)), jnp.bfloat16)
    wr = jnp.asarray(rng.normal(size=(b, L, 4 * c)), jnp.bfloat16)

    @jax.jit
    def core(fgp, wn, wr):
        sim = jnp.einsum("bpd,bld->bpl", fgp, wn)
        sim = jax.nn.softmax(sim * 10.0, axis=-1)
        return jnp.einsum("bpl,bld->bpd", sim, wr)

    res["einsum_core_ms"] = timeit("einsum+softmax core", core, fgp, wn, wr)
    macs = b * P * L * (D + 4 * c)
    res["einsum_core_tfs"] = round(2 * macs / (res["einsum_core_ms"] / 1e3) / 1e12, 1)
    print(f"  core algorithmic rate: {res['einsum_core_tfs']} TF/s "
          f"({100 * res['einsum_core_tfs'] / TPU_PEAK_TFS:.0f}% of peak)")

    # 3. extraction + overlap-add alone (attention replaced by identity)
    @jax.jit
    def extract_oadd(bgx):
        w_recon = _extract_patches(bgx, 2, 1, dilation=1)  # (B, L, 2, 2, C)
        rp = w_recon.reshape(b, hw, hw, 2, 2, c)
        canvas = jnp.zeros((b, hw + 2, hw + 2, c), bgx.dtype)
        for di in range(2):
            for dj in range(2):
                canvas = canvas.at[:, di:di + hw, dj:dj + hw, :].add(
                    rp[:, :, :, di, dj, :])
        return canvas

    res["extract_oadd_ms"] = timeit("extract+overlap-add", extract_oadd, bg)

    print(json.dumps({"metric": "ca_block_profile", **res}))


if __name__ == "__main__":
    main()
