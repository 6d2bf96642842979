"""Round-3 follow-up probe: what remains of the 64^3 inference unit cost?

Measures the bare d4f16 3D U-Net forward at the cross-coset chunk shape
(b=128, 64^3, bf16) with serially-chained calls inside one jit (the only
honest timing on the tunneled platform — docs/BENCHMARKS.md), under three
configurations:

- norm="group" (the shipping network),
- norm="none"  (isolates the GroupNorm chains),
- norm="group" with act="none" is not a knob — activation stays.

The difference bounds what a fused Pallas GN(+ReLU) kernel could buy at
this shape. Run (real TPU, exclusive): python benchmarks/infer_overhead_probe.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 8  # chained calls per timing unit


def chain_ms(net, variables, x, n_timed=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(variables, x0):
        def body(carry, _):
            out = net.apply(variables, carry, train=False)  # (B,...,1)
            return out.astype(x0.dtype), ()

        out, _ = jax.lax.scan(body, x0, None, length=K)
        return out

    def sync(o):
        return float(o[0, 0, 0, 0, 0])

    sync(chained(variables, x))  # compile
    sync(chained(variables, x))
    t0 = time.perf_counter()
    out = None
    for _ in range(n_timed):
        out = chained(variables, x)
    sync(out)
    return (time.perf_counter() - t0) / (n_timed * K) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from ich_tpu.models import UNet

    float(jnp.ones(()).sum())  # tunnel warmup
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(128, 64, 64, 64, 1)).astype(np.float32))

    out = {}
    for norm in ("group", "none"):
        net = UNet(depth=4, ndim=3, top_filter=16, p_dropout=0.0,
                   norm=norm, dtype=jnp.bfloat16)
        variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 64, 1)))
        out[f"net_b128_64cubed_norm_{norm}_ms"] = round(chain_ms(net, variables, x), 2)
        print(norm, out[f"net_b128_64cubed_norm_{norm}_ms"], flush=True)
    g = out["net_b128_64cubed_norm_group_ms"]
    n = out["net_b128_64cubed_norm_none_ms"]
    out["groupnorm_share_pct"] = round(100 * (g - n) / g, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
