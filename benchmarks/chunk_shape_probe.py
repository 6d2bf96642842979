"""Is the 128+97 chunk split of the 225-patch sliding-window stack optimal?

The 64x512x512 headline volume yields 225 coset patches; the coset path
runs the network in ``batch_size`` chunks (128 -> calls of 128+97; see
`ich_tpu/ops/sliding_window.py` "Pass 2"). Round-3 measurements showed the
per-call cost is quantized in ~128-patch units for b in 32..128; this
probe extends the curve past 128 (b in {97, 128, 160, 225, 256}) to answer
whether ONE b=225 call beats the two-call split (or whether a different
split does), using the serially-chained scan timing that is honest on the
tunneled platform (docs/BENCHMARKS.md).

Prints per-batch ms, ms/patch, and the implied best plan for 225 patches.
Run (real TPU, exclusive): python benchmarks/chunk_shape_probe.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from infer_overhead_probe import chain_ms  # noqa: E402

BATCHES = (97, 128, 160, 225, 256)


def main():
    import jax
    import jax.numpy as jnp

    from ich_tpu.models import UNet

    plat = jax.devices()[0].platform
    if plat not in ("tpu", "axon"):
        raise SystemExit(f"must run on the chip (got platform={plat!r})")

    float(jnp.ones(()).sum())  # tunnel warmup
    rng = np.random.default_rng(0)
    net = UNet(depth=4, ndim=3, top_filter=16, p_dropout=0.0,
               norm="group", dtype=jnp.bfloat16)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 64, 1)))

    per_b = {}
    for b in BATCHES:
        x = jnp.asarray(rng.uniform(size=(b, 64, 64, 64, 1)).astype(np.float32))
        ms = chain_ms(net, variables, x)
        per_b[b] = round(ms, 2)
        print(f"b={b:4d}  {ms:7.2f} ms  {ms / b * 1e3:6.1f} us/patch", flush=True)

    # cost of covering 225 patches with calls of size b (last call ragged,
    # assumed to cost like the measured batch nearest >= its size)
    def plan_cost(sizes):
        total = 0.0
        for s in sizes:
            total += per_b[min((b for b in BATCHES if b >= s), default=256)]
        return total

    plans = {"128+97": (128, 97), "225": (225,), "113+112": (128, 128),
             "3x75": (97, 97, 97)}
    costs = {k: round(plan_cost(v), 2) for k, v in plans.items()}
    best = min(costs, key=costs.get)
    print(json.dumps({"metric": "chunk_plan_225", "per_batch_ms": per_b,
                      "plan_ms": costs, "best": best}))


if __name__ == "__main__":
    main()
