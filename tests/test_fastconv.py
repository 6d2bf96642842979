"""Output-packed conv (ops/fastconv): exact equivalence with the direct
SAME convolution, gradient parity, and the flax drop-in module."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ich_tpu.models.layers import PConv
from ich_tpu.ops import fastconv


def direct(x, w):
    n = x.ndim - 2
    return jax.lax.conv_general_dilated(
        x, w, (1,) * n, "SAME", dimension_numbers=fastconv._dim_numbers(n)
    )


@pytest.mark.parametrize(
    "shape,k,c_out,pack",
    [
        ((2, 16, 16, 3), (3, 3), 16, (2, 2)),
        ((2, 16, 32, 5), (3, 3), 8, (2, 4)),
        ((1, 8, 16, 16, 2), (3, 3, 3), 16, (2, 2, 2)),
        ((1, 8, 8, 8, 4), (3, 3, 3), 32, (1, 2, 2)),
        ((2, 12, 12, 3), (5, 5), 16, (2, 2)),
        ((2, 16, 16, 1), (1, 1), 4, (2, 2)),
    ],
)
def test_packed_conv_matches_direct(shape, k, c_out, pack):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, shape, jnp.float32)
    w = jax.random.normal(kw, k + (shape[-1], c_out), jnp.float32) * 0.1
    got = fastconv.packed_conv(x, w, pack)
    want = direct(x, w)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_packed_conv_gradients_match():
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (2, 16, 16, 3), jnp.float32)
    w = jax.random.normal(kw, (3, 3, 3, 16), jnp.float32) * 0.1

    def loss_packed(w, x):
        return jnp.sum(fastconv.packed_conv(x, w, (2, 2)) ** 2)

    def loss_direct(w, x):
        return jnp.sum(direct(x, w) ** 2)

    gw_p, gx_p = jax.grad(loss_packed, argnums=(0, 1))(w, x)
    gw_d, gx_d = jax.grad(loss_direct, argnums=(0, 1))(w, x)
    np.testing.assert_allclose(gw_p, gw_d, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gx_p, gx_d, rtol=1e-4, atol=1e-4)


def test_choose_pack_rules():
    # small-channel 3D shape -> full scored choice (2x2x2 at C_out=16)
    assert fastconv.choose_pack((64, 64, 64), (3, 3, 3), 16, c_in=16) == (2, 2, 2)
    # mid c_in: only a single factor-2 axis (measured gate)
    p = fastconv.choose_pack((64, 64, 64), (3, 3, 3), 16, c_in=32)
    assert p is not None and sorted(p) == [1, 1, 2]
    # outside the measured win region: direct
    assert fastconv.choose_pack((32, 32, 32), (3, 3, 3), 32, c_in=16) is None
    assert fastconv.choose_pack((32, 32, 32), (3, 3, 3), 16, c_in=64) is None
    # odd spatial dims can't be packed (even axes still can, partially)
    assert fastconv.choose_pack((15, 15, 15), (3, 3, 3), 16, c_in=8) is None
    p = fastconv.choose_pack((15, 16, 16), (3, 3, 3), 16, c_in=8)
    assert p is not None and p[0] == 1
    # even kernels skipped
    assert fastconv.choose_pack((16, 16, 16), (2, 2, 2), 16, c_in=8) is None
    # 2D dispatch stays direct until profiled
    assert fastconv.choose_pack((256, 256), (3, 3), 16, c_in=8) is None


def test_pconv_module_matches_nn_conv():
    import flax.linen as nn

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 16, 16, 4), jnp.float32)
    ref = nn.Conv(16, (3, 3, 3), padding="SAME")
    mod = PConv(16, (3, 3, 3))
    v = ref.init(jax.random.PRNGKey(3), x)
    want = ref.apply(v, x)
    fastconv.set_packing("off")
    try:
        got_off = mod.apply(v, x)  # same params: shapes/names identical
    finally:
        fastconv.set_packing("on")
    try:
        got_on = mod.apply(v, x)
    finally:
        fastconv.set_packing("auto")
    np.testing.assert_allclose(got_off, want, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got_on, want, rtol=2e-5, atol=2e-5)


def test_unet_forward_invariant_under_packing():
    from ich_tpu.models import UNet

    net = UNet(depth=3, ndim=3, top_filter=8, p_dropout=0.0, norm="group")
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 16, 1), jnp.float32)
    fastconv.set_packing("off")
    try:
        v = net.init(jax.random.PRNGKey(5), x)
        want = net.apply(v, x, train=False)
    finally:
        fastconv.set_packing("on")
    try:
        got = net.apply(v, x, train=False)
    finally:
        fastconv.set_packing("auto")
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)


@pytest.mark.slow  # two fresh-interpreter jax imports
def test_packing_env_override():
    """ICH_TPU_PACKING sets the initial mode (serving CLIs enable the
    kernel without code changes); invalid values fail fast."""
    import subprocess
    import sys

    code = ("import jax; jax.config.update('jax_platforms', 'cpu');"
            "from ich_tpu.ops import fastconv;"
            "print(fastconv.packing_key())")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env={**__import__('os').environ, "ICH_TPU_PACKING": "on",
             "PYTHONPATH": "/root/.axon_site:/root/repo"})
    assert out.stdout.strip().endswith("on"), out.stderr
    bad = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env={**__import__('os').environ, "ICH_TPU_PACKING": "bogus",
             "PYTHONPATH": "/root/.axon_site:/root/repo"})
    assert bad.returncode != 0 and "ICH_TPU_PACKING" in bad.stderr
