"""Shape/behavior tests for the remaining network families."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ich_tpu.models import (
    AENet,
    ContextualAttention,
    FCDD_CNN_VGG,
    GatedGenerator,
    PatchDiscriminator,
    SAGatedGenerator,
    SelfAttention,
    UNet,
    receptive_upsample,
    resnet18,
    resnet50,
)

KEY = jax.random.PRNGKey(0)


@pytest.mark.slow
def test_ae_shapes_and_tanh_range():
    net = AENet(latent_channels=8, bottleneck_channels=8, n_conv=2, kernel_size=3)
    x = jnp.zeros((2, 32, 32, 1))
    v = net.init(KEY, x)
    out, z = net.apply(v, x, return_bottleneck=True)
    assert out.shape == (2, 32, 32, 1)
    assert z.shape == (2, 4, 4, 8)  # 3 stride-2 convs: 32 -> 4
    o = np.asarray(out)
    assert (o >= -1).all() and (o <= 1).all()


@pytest.mark.slow
def test_ae_bilinear_decoder():
    net = AENet(latent_channels=4, bottleneck_channels=4, n_conv=2, bilinear=True, kernel_size=3)
    v = net.init(KEY, jnp.zeros((1, 16, 16, 1)))
    out = net.apply(v, jnp.zeros((1, 16, 16, 1)))
    assert out.shape == (1, 16, 16, 1)


@pytest.mark.parametrize("factory,blocks", [(resnet18, 8), (resnet50, 16)])
@pytest.mark.slow
def test_resnet_shapes(factory, blocks):
    net = factory(num_classes=2)
    x = jnp.zeros((2, 64, 64, 1))
    v = net.init(KEY, x)
    logits, feats = net.apply(v, x, return_features=True)
    assert logits.shape == (2, 2)
    exp_feats = 512 if factory is resnet18 else 2048
    assert feats.shape == (2, exp_feats)


@pytest.mark.slow
def test_gated_unet():
    net = UNet(depth=3, top_filter=4, gated=True, p_dropout=0.0)
    x = jnp.zeros((1, 32, 32, 2))  # image + attention channel
    v = net.init(KEY, x)
    y = net.apply(v, x)
    assert y.shape == (1, 32, 32, 1)
    # gated convs have doubled output channels in kernels
    kern = v["params"]["encoder"]["down_0"]["conv1"]["kernel"]
    assert kern.shape[-1] == 2 * (4 // 2)  # 2 * mid_channels


@pytest.mark.slow
def test_fcdd_score_map_and_heatmap():
    net = FCDD_CNN_VGG()
    x = jnp.zeros((1, 64, 64, 1))
    v = net.init(KEY, x)
    scores = net.apply(v, x)
    assert scores.shape == (1, 8, 8, 1)  # 3 pools: /8
    feats = net.apply(v, x, ad=False)
    assert feats.shape == (1, 8, 8, 512)
    heat = FCDD_CNN_VGG.heatmap(scores, (64, 64))
    assert heat.shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(heat)).all()


def test_receptive_upsample_centers():
    """A one-hot score at (p, p) spreads an unnormalized Gaussian bump whose
    peak (value = score, the kernel peak is 1) lands at input coordinate
    p*j + int(s) — the reference's receptive-center alignment
    (``FCDD_BaseNet.py:86-99``; r=62, j=8, s=3.5 for the VGG stack)."""
    s = jnp.zeros((1, 4, 4, 1)).at[0, 2, 2, 0].set(2.5)
    up = np.asarray(receptive_upsample(s, (32, 32)))[0, :, :, 0]
    assert up.shape == (32, 32)
    peak = np.unravel_index(np.argmax(up), up.shape)
    assert peak == (2 * 8 + 3, 2 * 8 + 3)
    # even-size gkern duplicates + halves the center sample -> 2x2 plateau
    # of (1/2)^2 = 0.25 x score (FCDD_BaseNet.py:23-28)
    np.testing.assert_allclose(up.max(), 2.5 * 0.25, rtol=1e-5)


def test_self_attention_identity_at_init():
    """gamma init 0 -> module is the identity at initialization."""
    m = SelfAttention()
    x = jax.random.normal(KEY, (2, 8, 8, 16))
    v = m.init(KEY, x)
    y = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_contextual_attention_reconstructs_from_bg():
    """With fg == bg and a tiny softmax scale... basic: output finite, right
    shape; with very peaked softmax and fg==bg each pixel attends to its own
    patch -> output close to bg itself."""
    ca = ContextualAttention(kernel_size=3, softmax_scale=1000.0)
    x = jax.random.normal(KEY, (1, 12, 12, 4))
    v = ca.init(KEY, x, x)
    out = ca.apply(v, x, x)
    assert out.shape == x.shape
    # interior should be close to the input (self-attention to own patch)
    d = np.abs(np.asarray(out) - np.asarray(x))[:, 2:-2, 2:-2, :]
    assert d.mean() < 0.15


@pytest.mark.slow
def test_gated_generator_masked_region_only():
    g = GatedGenerator(lat_channels=4, context_attention=True, return_coarse=True)
    img = jax.random.uniform(KEY, (1, 32, 32, 1))
    mask = jnp.zeros((1, 32, 32, 1)).at[:, 8:16, 8:16, :].set(1.0)
    v = g.init(KEY, img, mask)
    fine, coarse = g.apply(v, img, mask)
    assert fine.shape == img.shape and coarse.shape == img.shape
    assert (np.asarray(fine) >= 0).all() and (np.asarray(fine) <= 1).all()


@pytest.mark.slow
def test_sa_gated_generator_and_discriminator():
    g = SAGatedGenerator(lat_channels=4)
    img = jax.random.uniform(KEY, (1, 32, 32, 1))
    mask = jnp.zeros((1, 32, 32, 1)).at[:, 4:12, 4:12, :].set(1.0)
    v = g.init(KEY, img, mask)
    fine, coarse = g.apply(v, img, mask)
    assert fine.shape == img.shape

    d = PatchDiscriminator(out_channels=(8, 16, 16), kernel_size=5, stride=2)
    vd = d.init(KEY, img, mask)
    s = d.apply(vd, img, mask)
    assert s.shape == (1, 8, 8, 16)
    assert "spectral_stats" in vd


def test_spectral_norm_constrains_weights():
    """After spectral-stat updates the effective conv weight has unit top
    singular value (approximately)."""
    d = PatchDiscriminator(out_channels=(8, 8), kernel_size=3, stride=2,
                           self_attention=False, norm=False)
    img = jax.random.uniform(KEY, (2, 16, 16, 1))
    mask = jnp.zeros((2, 16, 16, 1))
    v = d.init(KEY, img, mask)
    # run a few updates of the power iteration
    for i in range(5):
        _, upd = d.apply(v, img, mask, train=True, mutable=["spectral_stats", "batch_stats"])
        v = {**v, **upd}
    out1 = d.apply(v, img, mask)
    assert np.isfinite(np.asarray(out1)).all()


def test_flat_group_norm_matches_flax():
    """FlatGroupNorm (reshape-free statistics) == nn.GroupNorm on the same
    params, both dtypes, 2D and 3D inputs."""
    import flax.linen as nn
    from ich_tpu.models.layers import FlatGroupNorm

    rng = np.random.default_rng(6)
    for shape, groups in [((2, 8, 8, 16), 2), ((2, 4, 6, 8, 32), 4), ((3, 5, 5, 8), 1)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 3 + 1)
        ref_m = nn.GroupNorm(num_groups=groups)
        v = ref_m.init(KEY, x)
        scale = jnp.asarray(rng.uniform(0.5, 2.0, shape[-1]).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32))
        v = {"params": {"scale": scale, "bias": bias}}
        want = ref_m.apply(v, x)
        got = FlatGroupNorm(num_groups=groups).apply(v, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
    # bf16 in/out path returns bf16
    xb = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32)).astype(jnp.bfloat16)
    m = FlatGroupNorm(num_groups=2, dtype=jnp.bfloat16)
    vb = m.init(KEY, xb)
    out = m.apply(vb, xb)
    assert out.dtype == jnp.bfloat16
    # near-constant large-magnitude input: E[x^2]-E[x]^2 cancels negative in
    # f32; the clamp keeps it finite (nn.GroupNorm behaves the same)
    xc = jnp.asarray((300.0 + 1e-3 * rng.normal(size=(2, 8, 8, 16))).astype(np.float32))
    mc = FlatGroupNorm(num_groups=2)
    vc = mc.init(KEY, xc)
    assert np.isfinite(np.asarray(mc.apply(vc, xc))).all()


def test_inpainting_remat_equals_plain():
    """remat=True on the gated generator / patch discriminator is
    numerically identical (forward + grads) and shares the parameter tree
    with remat=False (lifted transform — checkpoints interoperate)."""
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(size=(2, 32, 32, 1)).astype(np.float32))
    mask = jnp.zeros((2, 32, 32, 1)).at[:, 8:20, 10:22].set(1.0)

    kw = dict(lat_channels=8, return_coarse=True)
    plain = GatedGenerator(**kw)
    rem = GatedGenerator(remat=True, **kw)
    v = plain.init(KEY, img, mask)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        rem.init(KEY, img, mask))
    for a, b in zip(plain.apply(v, img, mask), rem.apply(v, img, mask)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)

    def loss_fn(mod, params):
        fine, coarse = mod.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, img, mask)
        return jnp.sum(fine**2) + jnp.sum(coarse**2)

    g1 = jax.grad(lambda p: loss_fn(plain, p))(v["params"])
    g2 = jax.grad(lambda p: loss_fn(rem, p))(v["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5),
        g1, g2)

    d_plain = PatchDiscriminator(out_channels=(8, 8, 8))
    d_rem = PatchDiscriminator(out_channels=(8, 8, 8), remat=True)
    dv = d_plain.init(KEY, img, mask)
    assert jax.tree_util.tree_structure(dv) == jax.tree_util.tree_structure(
        d_rem.init(KEY, img, mask))
    # train=True exercises the static-argnum branch + mutable collections
    o1, m1 = d_plain.apply(dv, img, mask, train=True,
                           mutable=["batch_stats", "spectral_stats"])
    o2, m2 = d_rem.apply(dv, img, mask, train=True,
                         mutable=["batch_stats", "spectral_stats"])
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-6, atol=1e-6)

    sa_plain = SAGatedGenerator(lat_channels=8, return_coarse=False)
    sa_rem = SAGatedGenerator(lat_channels=8, return_coarse=False, remat=True)
    sv = sa_plain.init(KEY, img, mask)
    assert jax.tree_util.tree_structure(sv) == jax.tree_util.tree_structure(
        sa_rem.init(KEY, img, mask))
    np.testing.assert_allclose(
        np.asarray(sa_plain.apply(sv, img, mask)),
        np.asarray(sa_rem.apply(sv, img, mask)), rtol=1e-6, atol=1e-6)


def test_unet_remat_equals_plain():
    """remat=True is numerically identical (forward + grads) and shares
    the parameter tree with remat=False."""
    import jax
    from ich_tpu.models.unet import UNet

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(size=(2, 16, 16, 16, 1)).astype(np.float32))
    kw = dict(depth=3, ndim=3, top_filter=8, midchannels_factor=1,
              p_dropout=0.0, norm="group")
    plain = UNet(**kw)
    rem = UNet(remat=True, **kw)
    v = plain.init(KEY, x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        rem.init(KEY, x))
    want = plain.apply(v, x, train=True)
    got = rem.apply(v, x, train=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)

    def loss_fn(mod, params):
        return jnp.sum(mod.apply({"params": params}, x, train=True) ** 2)

    g1 = jax.grad(lambda p: loss_fn(plain, p))(v["params"])
    g2 = jax.grad(lambda p: loss_fn(rem, p))(v["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5),
        g1, g2)


def test_gated_generator_remat_warns_on_axon(monkeypatch):
    """remat=True is TPU-unvalidated (the axon compile helper crashes on
    the program — docs/BENCHMARKS.md): the API must say so when built on
    that platform (VERDICT r4 item 6)."""
    import ich_tpu.models.inpainting as inp

    monkeypatch.setattr(inp, "_REMAT_WARNED", False)
    monkeypatch.setattr(inp.jax, "default_backend", lambda: "axon")
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(1, 32, 32, 1)).astype(np.float32))
    mask = jnp.zeros((1, 32, 32, 1))
    net = GatedGenerator(lat_channels=4, context_attention=False, remat=True)
    with pytest.warns(UserWarning, match="TPU-unvalidated"):
        net.init(KEY, img, mask)
    # one-shot: a second build does not warn again
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")
        net.init(KEY, img, mask)
    # and remat=False never warns
    monkeypatch.setattr(inp, "_REMAT_WARNED", False)
    with _w.catch_warnings():
        _w.simplefilter("error")
        GatedGenerator(lat_channels=4, context_attention=False).init(KEY, img, mask)
