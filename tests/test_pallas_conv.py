"""Correctness of the implicit-GEMM pallas conv (interpret mode on CPU)
against lax.conv_general_dilated, across the C_in/C_out shapes it accepts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ich_tpu.ops import pallas_conv as pc


@pytest.mark.parametrize("ci", [16, 32, 48, 64])
def test_conv3d_same16_matches_xla(ci):
    rng = np.random.default_rng(ci)
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 5, 8, 16, ci)).astype(np.float32))
    w = jnp.asarray((rng.uniform(-1, 1, size=(3, 3, 3, ci, 16)) * 0.2).astype(np.float32))
    assert pc.qualifies(x.shape, w.shape)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = pc.conv3d_same16(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("ci,co", [(32, 32), (64, 32), (96, 32), (8, 8), (16, 8)])
def test_conv3d_same_other_couts(ci, co):
    """The generalized lane tile: WTILE = 128/C_out w-offsets per lane
    block (C_out=32 covers the flagship net's second level incl. the
    96-channel decoder concat; C_out=8 the most lane-starved stem)."""
    rng = np.random.default_rng(ci * 100 + co)
    x = jnp.asarray(rng.uniform(-1, 1, size=(1, 4, 8, 32, ci)).astype(np.float32))
    w = jnp.asarray((rng.uniform(-1, 1, size=(3, 3, 3, ci, co)) * 0.2).astype(np.float32))
    assert pc.qualifies(x.shape, w.shape)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = pc.conv3d_same(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("nd", [2, 3])
def test_conv_same_cout64_optin(nd):
    """C_out=64 (wt=2, 3/4-dense packed weights) is kernel-supported but
    disabled by default pending its TPU gate; set_enabled_couts turns it on
    and the forward matches XLA. packing_key folds the non-default set in
    so memoized programs never go stale."""
    from ich_tpu.ops import fastconv

    ci, co = 64, 64
    xs = (1,) + ((4, 8, 16) if nd == 3 else (16, 32)) + (ci,)
    ws = (3,) * nd + (ci, co)
    q = pc.qualifies if nd == 3 else pc.qualifies2d
    assert not q(xs, ws)  # default-off
    fastconv.set_packing("pallas")
    pc.set_enabled_couts((8, 16, 32, 64))
    try:
        assert q(xs, ws)
        assert fastconv.packing_key() == "pallas:8,16,32,64"
        rng = np.random.default_rng(64 + nd)
        x = jnp.asarray(rng.uniform(-1, 1, size=xs).astype(np.float32))
        w = jnp.asarray((rng.uniform(-1, 1, size=ws) * 0.2).astype(np.float32))
        dn = ("NDHWC", "DHWIO", "NDHWC") if nd == 3 else ("NHWC", "HWIO", "NHWC")
        ref = jax.lax.conv_general_dilated(x, w, (1,) * nd, "SAME",
                                           dimension_numbers=dn)
        got = (pc.conv3d_same if nd == 3 else pc.conv2d_same)(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
    finally:
        pc.set_enabled_couts(pc.DEFAULT_COUTS)
        fastconv.set_packing("auto")
    assert fastconv.packing_key() == "auto"
    with pytest.raises(ValueError):
        pc.set_enabled_couts((8, 48))


def test_conv3d_same_bf16():
    """bf16 activations/weights (the serving dtype) stay on the kernel path
    and match the XLA conv at bf16 tolerance."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, size=(1, 4, 8, 16, 16)), jnp.bfloat16)
    w = jnp.asarray(rng.uniform(-0.2, 0.2, size=(3, 3, 3, 16, 16)), jnp.bfloat16)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = pc.conv3d_same(x, w)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=0.05, atol=0.05)


def test_qualifies_gates():
    ok = (2, 5, 8, 16, 16)
    wk = (3, 3, 3, 16, 16)
    assert pc.qualifies(ok, wk)
    assert not pc.qualifies((2, 5, 8, 12, 16), wk)       # W % WTILE != 0
    # ci % co != 0: the per-block lane slice would be 128-unaligned
    # (Mosaic rejects it) — 16->32 falls back to the direct conv
    assert not pc.qualifies(ok, (3, 3, 3, 16, 32))
    assert pc.qualifies((2, 5, 8, 16, 32), (3, 3, 3, 32, 32))
    assert not pc.qualifies((2, 5, 8, 16, 1), (3, 3, 3, 1, 16))    # ci=1
    assert not pc.qualifies(ok, (3, 3, 3, 16, 64))       # C_out=64 opt-in only
    assert not pc.qualifies(ok, (5, 3, 3, 16, 16))       # kernel != 3^3
    assert not pc.qualifies((2, 5, 8, 16, 12), (3, 3, 3, 12, 16))  # ci % co
    assert pc.qualifies((2, 5, 8, 16, 64), (3, 3, 3, 64, 16))      # wide ci ok
    assert not pc.qualifies((2, 256, 256, 512, 16), (3, 3, 3, 16, 16))  # VMEM
    assert not pc.qualifies((2, 5, 8, 4, 8), (3, 3, 3, 8, 32))     # W < 2*WTILE


@pytest.mark.parametrize("ci,co", [(32, 32), (64, 32), (96, 32), (16, 16)])
def test_conv2d_same_matches_xla(ci, co):
    """The 2D variant (H-tiled grid, dynamic kh row-windows on a resident
    image block) — covers the 2D flagship's 256^2 C=32 level."""
    rng = np.random.default_rng(ci * 7 + co)
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 16, 32, ci)).astype(np.float32))
    w = jnp.asarray((rng.uniform(-1, 1, size=(3, 3, ci, co)) * 0.2).astype(np.float32))
    assert pc.qualifies2d(x.shape, w.shape)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = pc.conv2d_same(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_conv2d_same_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(9)
    ci, co = 32, 32
    x = jnp.asarray(rng.uniform(-1, 1, size=(1, 16, 32, ci)).astype(np.float32))
    w = jnp.asarray((rng.uniform(-1, 1, size=(3, 3, ci, co)) * 0.2).astype(np.float32))

    def ref_loss(xi, wi):
        y = jax.lax.conv_general_dilated(
            xi, wi, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y ** 2)

    gx_ref, gw_ref = jax.grad(ref_loss, argnums=(0, 1))(x, w)
    gx_pk, gw_pk = jax.grad(
        lambda xi, wi: jnp.sum(pc.conv2d_same(xi, wi) ** 2), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_pk), np.asarray(gx_ref),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_pk), np.asarray(gw_ref),
                               rtol=1e-3, atol=1e-3)


def test_qualifies2d_gates():
    ok = (2, 16, 32, 32)
    wk = (3, 3, 32, 32)
    assert pc.qualifies2d(ok, wk)
    assert not pc.qualifies2d((2, 16, 30, 32), wk)        # W % WTILE
    assert not pc.qualifies2d(ok, (3, 3, 32, 64))         # C_out=64
    assert not pc.qualifies2d(ok, (5, 5, 32, 32))         # kernel != 3x3
    assert not pc.qualifies2d((2, 4, 32, 32), (3, 3, 32, 32))  # H too small
    # H-tiling makes the budget independent of image height...
    assert pc.qualifies2d((2, 2048, 2048, 32), wk)
    # ...but a row that can't fit VMEM even at the smallest tile is out
    assert not pc.qualifies2d((2, 16, 8192, 128), (3, 3, 128, 32))
    # the flagship decoder concat shape must stay in (gate row)
    assert pc.qualifies2d((16, 256, 256, 64), (3, 3, 64, 32))


@pytest.mark.parametrize("ci,co", [(16, 16), (64, 32)])
def test_conv3d_same_custom_vjp_matches_autodiff(ci, co):
    """grad through the kernel (custom VJP: input grad = rot-180
    channel-swapped SAME conv, weight grad = XLA's formulation) equals
    autodiff through the direct conv."""
    rng = np.random.default_rng(co)
    x = jnp.asarray(rng.uniform(-1, 1, size=(1, 4, 8, 16, ci)).astype(np.float32))
    w = jnp.asarray((rng.uniform(-1, 1, size=(3, 3, 3, ci, co)) * 0.2).astype(np.float32))

    def ref_loss(xi, wi):
        y = jax.lax.conv_general_dilated(
            xi, wi, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.sum(y ** 2)

    def pk_loss(xi, wi):
        return jnp.sum(pc.conv3d_same(xi, wi) ** 2)

    gx_ref, gw_ref = jax.grad(ref_loss, argnums=(0, 1))(x, w)
    gx_pk, gw_pk = jax.grad(pk_loss, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_pk), np.asarray(gx_ref),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_pk), np.asarray(gw_ref),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.slow  # interpret-mode UNet forward ~90 s on CPU
def test_pallas_mode_in_unet_forward():
    """set_packing("pallas") routes qualifying convs inside the 3D U-Net;
    forward output matches the direct-conv network."""
    from ich_tpu.models import UNet
    from ich_tpu.ops import fastconv

    rng = np.random.default_rng(0)
    net = UNet(depth=2, ndim=3, top_filter=16, p_dropout=0.0, norm="group")
    x = jnp.asarray(rng.uniform(size=(1, 8, 8, 16, 1)).astype(np.float32))
    v = net.init(jax.random.PRNGKey(0), x)
    ref = net.apply(v, x, train=False)
    fastconv.set_packing("pallas")
    try:
        got = net.apply(v, x, train=False)
    finally:
        fastconv.set_packing("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow  # ~10 interpret-mode kernels
def test_kernel_property_sweep():
    """Randomized qualifying shapes (2D + 3D), forward vs lax.conv; a grad
    spot-check per ndim. Guards the window algebra across tile choices."""
    rng = np.random.default_rng(2024)
    cases = []
    for i in range(6):
        co = int(rng.choice([8, 16, 32]))
        wt = 128 // co
        ci = co * int(rng.choice([1, 2, 3]))  # qualify rule: ci % co == 0
        nd = 2 if i % 2 == 0 else 3  # three cases per ndim
        w = wt * int(rng.integers(2, 5))
        h = int(rng.choice([8, 16]) if nd == 2 else rng.integers(4, 9))
        d = int(rng.integers(3, 6))
        xs = (1,) + ((d, h, w) if nd == 3 else (h * (2 if nd == 2 else 1), w)) + (ci,)
        cases.append((nd, xs, (3,) * nd + (ci, co)))
    grad_checked = set()
    for nd, xs, ws in cases:
        q = pc.qualifies(xs, ws) if nd == 3 else pc.qualifies2d(xs, ws)
        if not q:
            continue
        x = jnp.asarray(rng.uniform(-1, 1, size=xs).astype(np.float32))
        w = jnp.asarray((rng.uniform(-1, 1, size=ws) * 0.2).astype(np.float32))
        dn = ("NDHWC", "DHWIO", "NDHWC") if nd == 3 else ("NHWC", "HWIO", "NHWC")
        ref_fn = lambda xi, wi: jax.lax.conv_general_dilated(
            xi, wi, (1,) * nd, "SAME", dimension_numbers=dn)
        pk_fn = pc.conv3d_same if nd == 3 else pc.conv2d_same
        ref = ref_fn(x, w)
        got = pk_fn(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4, err_msg=str((nd, xs, ws)))
        if nd not in grad_checked:  # one grad spot-check per ndim
            grad_checked.add(nd)
            cot = jnp.asarray(rng.uniform(-1, 1, size=ref.shape).astype(np.float32))
            gx_r, gw_r = jax.grad(
                lambda xi, wi: jnp.sum(ref_fn(xi, wi) * cot), argnums=(0, 1))(x, w)
            gx_p, gw_p = jax.grad(
                lambda xi, wi: jnp.sum(pk_fn(xi, wi) * cot), argnums=(0, 1))(x, w)
            np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                                       rtol=1e-3, atol=1e-3, err_msg=str((nd, xs, ws)))
            np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                                       rtol=1e-3, atol=1e-3, err_msg=str((nd, xs, ws)))
    assert grad_checked == {2, 3}, f"grad coverage incomplete: {grad_checked}"


@pytest.mark.slow  # interpret-mode UNet with co=64 levels
def test_pallas64_in_unet_forward():
    """The pallas64 arm (C_out=64 enabled) inside a 3D U-Net whose level-2
    convs are 64-channel: forward matches the direct-conv network."""
    from ich_tpu.models import UNet
    from ich_tpu.ops import fastconv

    rng = np.random.default_rng(64)
    net = UNet(depth=3, ndim=3, top_filter=32, p_dropout=0.0, norm="group")
    x = jnp.asarray(rng.uniform(size=(1, 8, 8, 16, 1)).astype(np.float32))
    v = net.init(jax.random.PRNGKey(0), x)
    ref = net.apply(v, x, train=False)
    fastconv.set_packing("pallas")
    pc.set_enabled_couts(pc.COUTS)
    try:
        got = net.apply(v, x, train=False)
    finally:
        pc.set_enabled_couts(pc.DEFAULT_COUTS)
        fastconv.set_packing("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow  # interpret-mode fused train step through the trainer
def test_fuse_train_trainer_step():
    """One UNet3D train step with set_fuse_train(True) (mode "pallas")
    reproduces the unfused step's loss — the fusion flag is safe through
    the full trainer machinery (donated state, sampler keys, optimizer)."""
    import jax as _jax

    from ich_tpu.models import UNet
    from ich_tpu.ops import fastconv
    from ich_tpu.train import UNet3D

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(2, 8, 8, 16)).astype(np.float32))
    msks = jnp.asarray((rng.uniform(size=(2, 8, 8, 16)) > 0.9).astype(np.float32))
    key = _jax.random.PRNGKey(0)

    def one_step():
        net = UNet(depth=2, ndim=3, top_filter=16, p_dropout=0.0, norm="group")
        tr = UNet3D(net, patch_size=(8, 8, 16), n_epoch=1, batch_size=2,
                    lr=1e-3, loss_fn="BinaryDiceLoss",
                    loss_fn_kwargs={"reduction": "mean"})
        tr._ensure_state((8, 8, 16), steps_per_epoch=10)
        step = tr._make_train_step()
        _, loss = step(tr.state, imgs, msks, key)
        return float(loss)

    ref = one_step()
    fastconv.set_packing("pallas")
    fastconv.set_fuse_train(True)
    try:
        got = one_step()
    finally:
        fastconv.set_fuse_train(False)
        fastconv.set_packing("auto")
    assert abs(got - ref) < 1e-4, (got, ref)


@pytest.mark.slow  # ~6 interpret-mode fused kernels
def test_fused_property_sweep():
    """Randomized qualifying shapes through the prologue+epilogue fused
    entry points (pro_stats) vs the unfused composition — guards the pad
    masking and per-step stats reduction across tile choices, both ndims."""
    rng = np.random.default_rng(4096)
    for i in range(6):
        co = int(rng.choice([8, 16, 32]))
        wt = 128 // co
        ci = co * int(rng.choice([1, 2]))  # qualify rule: ci % co == 0
        nd = 2 if i % 2 == 0 else 3
        w_sp = wt * int(rng.integers(2, 5))
        h = int(rng.choice([8, 16, 32]) if nd == 2 else rng.integers(4, 9))
        d = int(rng.integers(3, 6))
        xs = (2,) + ((d, h, w_sp) if nd == 3 else (h * 2, w_sp)) + (ci,)
        ws = (3,) * nd + (ci, co)
        q = pc.qualifies(xs, ws) if nd == 3 else pc.qualifies2d(xs, ws)
        assert q, (nd, xs, ws)
        x = jnp.asarray(rng.uniform(-1, 1, size=xs).astype(np.float32))
        w = jnp.asarray((rng.uniform(-1, 1, size=ws) * 0.2).astype(np.float32))
        a = jnp.asarray(rng.uniform(0.5, 2.0, size=(2, ci)).astype(np.float32))
        b = jnp.asarray(rng.uniform(0.1, 1.0, size=(2, ci)).astype(np.float32))
        bshape = (2,) + (1,) * nd + (ci,)
        y = jnp.maximum(x * a.reshape(bshape) + b.reshape(bshape), 0)
        dn = ("NDHWC", "DHWIO", "NDHWC") if nd == 3 else ("NHWC", "HWIO", "NHWC")
        ref = jax.lax.conv_general_dilated(y, w, (1,) * nd, "SAME",
                                           dimension_numbers=dn)
        rf = ref.astype(jnp.float32)
        red = tuple(range(1, rf.ndim - 1))
        fn = pc.conv3d_same_pro_stats if nd == 3 else pc.conv2d_same_pro_stats
        got, m, q_ = fn(x, a, b, w)
        msg = str((nd, xs, ws))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4, err_msg=msg)
        np.testing.assert_allclose(np.asarray(m), np.asarray(jnp.mean(rf, red)),
                                   rtol=2e-4, atol=2e-4, err_msg=msg)
        np.testing.assert_allclose(
            np.asarray(q_), np.asarray(jnp.mean(jnp.square(rf), red)),
            rtol=2e-4, atol=2e-4, err_msg=msg)


@pytest.mark.parametrize("ci,co", [(16, 16), (32, 32), (8, 8)])
def test_conv3d_same_pro_matches_composition(ci, co):
    """Prologue-fused kernel == conv(relu(x*a+b), w): the GN-normalize+ReLU
    fusion must keep SAME padding zero *post*-relu (relu(b) > 0 for b > 0,
    so the pad masking is load-bearing — b is drawn positive here)."""
    rng = np.random.default_rng(ci + co)
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 4, 8, 16, ci)).astype(np.float32))
    w = jnp.asarray((rng.uniform(-1, 1, size=(3, 3, 3, ci, co)) * 0.2).astype(np.float32))
    a = jnp.asarray(rng.uniform(0.5, 2.0, size=(2, ci)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0.1, 1.0, size=(2, ci)).astype(np.float32))
    y = jnp.maximum(x * a[:, None, None, None, :] + b[:, None, None, None, :], 0)
    ref = jax.lax.conv_general_dilated(
        y, w, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = pc.conv3d_same_pro(x, a, b, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("ci,co", [(64, 32), (32, 32), (16, 16)])
def test_conv2d_same_pro_matches_composition(ci, co):
    rng = np.random.default_rng(ci * 3 + co)
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 16, 32, ci)).astype(np.float32))
    w = jnp.asarray((rng.uniform(-1, 1, size=(3, 3, ci, co)) * 0.2).astype(np.float32))
    a = jnp.asarray(rng.uniform(0.5, 2.0, size=(2, ci)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0.1, 1.0, size=(2, ci)).astype(np.float32))
    y = jnp.maximum(x * a[:, None, None, :] + b[:, None, None, :], 0)
    ref = jax.lax.conv_general_dilated(
        y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = pc.conv2d_same_pro(x, a, b, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_conv2d_same_pro_multi_htile():
    """H large enough to span several H-tiles: the global-row mask built
    from program_id must still zero exactly the pad rows."""
    rng = np.random.default_rng(77)
    ci, co = 16, 16
    x = jnp.asarray(rng.uniform(-1, 1, size=(1, 64, 16, ci)).astype(np.float32))
    w = jnp.asarray((rng.uniform(-1, 1, size=(3, 3, ci, co)) * 0.2).astype(np.float32))
    a = jnp.asarray(rng.uniform(0.5, 2.0, size=(1, ci)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0.1, 1.0, size=(1, ci)).astype(np.float32))
    y = jnp.maximum(x * a[:, None, None, :] + b[:, None, None, :], 0)
    ref = jax.lax.conv_general_dilated(
        y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = pc.conv2d_same_pro(x, a, b, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("ndim", [2, 3])
def test_convblock_gn_prologue_fusion(ndim):
    """set_packing("pallas") + eval + GroupNorm routes ConvBlock's second
    conv through the prologue-fused kernel; output matches the unfused
    chain (same params — the fusion leaves the param tree untouched)."""
    from ich_tpu.models.layers import ConvBlock
    from ich_tpu.ops import fastconv

    rng = np.random.default_rng(ndim)
    spatial = (8, 16) if ndim == 2 else (4, 8, 16)
    x = jnp.asarray(rng.uniform(-1, 1, size=(2,) + spatial + (16,)).astype(np.float32))
    blk = ConvBlock(out_channels=16, ndim=ndim, norm="group", p_dropout=0.0)
    v = blk.init(jax.random.PRNGKey(0), x)
    ref = blk.apply(v, x, train=False)
    fastconv.set_packing("pallas")
    try:
        got = blk.apply(v, x, train=False)
    finally:
        fastconv.set_packing("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_convblock_gn_fusion_bf16():
    """The serving/bench net runs bf16: the fused eval path (prologue +
    epilogue stats, bias shift) must match the unfused chain at bf16
    tolerance on the dtype the TPU A/B actually measures."""
    from ich_tpu.models.layers import ConvBlock
    from ich_tpu.ops import fastconv

    rng = np.random.default_rng(16)
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 4, 8, 16, 16)), jnp.bfloat16)
    blk = ConvBlock(out_channels=16, ndim=3, norm="group", p_dropout=0.0,
                    dtype=jnp.bfloat16)
    v = blk.init(jax.random.PRNGKey(0), x)
    ref = blk.apply(v, x, train=False)
    fastconv.set_packing("pallas")
    try:
        got = blk.apply(v, x, train=False)
    finally:
        fastconv.set_packing("auto")
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.1, atol=0.05)


@pytest.mark.parametrize("ndim", [2, 3])
def test_convblock_eval_grad_pallas(ndim):
    """jax.grad through an *eval*-mode fused ConvBlock (pallas mode) must
    work — saliency/FCDD-style heatmaps differentiate eval applies. The
    fused fastconv cores carry custom VJPs over the unfused composition, so
    input grads match the direct-conv network."""
    from ich_tpu.models.layers import ConvBlock
    from ich_tpu.ops import fastconv

    rng = np.random.default_rng(100 + ndim)
    spatial = (8, 16) if ndim == 2 else (4, 8, 16)
    x = jnp.asarray(rng.uniform(-1, 1, size=(2,) + spatial + (16,)).astype(np.float32))
    blk = ConvBlock(out_channels=16, ndim=ndim, norm="group", p_dropout=0.0)
    v = blk.init(jax.random.PRNGKey(0), x)

    def loss(xi):
        return jnp.sum(jnp.square(blk.apply(v, xi, train=False)))

    ref = jax.grad(loss)(x)
    fastconv.set_packing("pallas")
    try:
        got = jax.grad(loss)(x)
    finally:
        fastconv.set_packing("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("ndim", [2, 3])
def test_convblock_train_fusion_optin(ndim):
    """set_fuse_train(True) routes the *training* forward through the
    GN-fused kernels; outputs and param grads match the unfused chain
    (the fused cores' VJPs differentiate the exact composition), and
    packing_key() reflects the flag so memoized train programs retrace."""
    from ich_tpu.models.layers import ConvBlock
    from ich_tpu.ops import fastconv

    rng = np.random.default_rng(200 + ndim)
    spatial = (8, 16) if ndim == 2 else (4, 8, 16)
    x = jnp.asarray(rng.uniform(-1, 1, size=(2,) + spatial + (16,)).astype(np.float32))
    blk = ConvBlock(out_channels=16, ndim=ndim, norm="group", p_dropout=0.0)
    v = blk.init(jax.random.PRNGKey(0), x)

    def loss(vi):
        return jnp.sum(jnp.square(blk.apply(vi, x, train=True)))

    ref_y = blk.apply(v, x, train=True)
    ref_g = jax.grad(loss)(v)
    fastconv.set_packing("pallas")
    fastconv.set_fuse_train(True)
    try:
        assert fastconv.packing_key() == "pallas+ft"
        got_y = blk.apply(v, x, train=True)
        got_g = jax.grad(loss)(v)
    finally:
        fastconv.set_fuse_train(False)
        fastconv.set_packing("auto")
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y),
                               rtol=2e-4, atol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-3),
        ref_g, got_g)


@pytest.mark.parametrize("nd,ci,co", [(3, 16, 16), (3, 32, 32), (2, 64, 32), (2, 16, 16)])
def test_conv_same_stats_epilogue(nd, ci, co):
    """The epilogue stats outputs equal per-(sample, channel) mean and
    mean-of-squares recomputed from the written activation."""
    rng = np.random.default_rng(nd * 10 + co)
    xs = (2, 4, 8, 16, ci) if nd == 3 else (2, 64, 16, ci)
    ws = (3,) * nd + (ci, co)
    x = jnp.asarray(rng.uniform(-1, 1, size=xs).astype(np.float32))
    w = jnp.asarray((rng.uniform(-1, 1, size=ws) * 0.2).astype(np.float32))
    fn = pc.conv3d_same_stats if nd == 3 else pc.conv2d_same_stats
    y, m, q = fn(x, w)
    red = tuple(range(1, y.ndim - 1))
    np.testing.assert_allclose(np.asarray(m), np.asarray(jnp.mean(y, axis=red)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(q),
                               np.asarray(jnp.mean(jnp.square(y), axis=red)),
                               rtol=1e-5, atol=1e-6)
    dn = ("NDHWC", "DHWIO", "NDHWC") if nd == 3 else ("NHWC", "HWIO", "NHWC")
    ref = jax.lax.conv_general_dilated(x, w, (1,) * nd, "SAME",
                                       dimension_numbers=dn)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("nd", [2, 3])
def test_conv_same_pro_stats(nd):
    """Prologue + epilogue combined: fused affine/relu in, output stats out."""
    rng = np.random.default_rng(nd)
    ci, co = 16, 16
    xs = (2, 4, 8, 16, ci) if nd == 3 else (2, 32, 16, ci)
    x = jnp.asarray(rng.uniform(-1, 1, size=xs).astype(np.float32))
    w = jnp.asarray((rng.uniform(-1, 1, size=(3,) * nd + (ci, co)) * 0.2).astype(np.float32))
    a = jnp.asarray(rng.uniform(0.5, 2.0, size=(2, ci)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0.1, 1.0, size=(2, ci)).astype(np.float32))
    bshape = (2,) + (1,) * nd + (ci,)
    yin = jnp.maximum(x * a.reshape(bshape) + b.reshape(bshape), 0)
    dn = ("NDHWC", "DHWIO", "NDHWC") if nd == 3 else ("NHWC", "HWIO", "NHWC")
    ref = jax.lax.conv_general_dilated(yin, w, (1,) * nd, "SAME",
                                       dimension_numbers=dn)
    fn = pc.conv3d_same_pro_stats if nd == 3 else pc.conv2d_same_pro_stats
    y, m, q = fn(x, a, b, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    red = tuple(range(1, y.ndim - 1))
    np.testing.assert_allclose(np.asarray(m), np.asarray(jnp.mean(y, axis=red)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(q),
                               np.asarray(jnp.mean(jnp.square(y), axis=red)),
                               rtol=1e-5, atol=1e-6)
