import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ich_tpu.models import PartialUNet, UNet, UNetEncoder


def _init_apply(model, x, train=False, **call_kw):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, train=train, **call_kw)
    out = model.apply(
        variables,
        x,
        train=train,
        rngs={"dropout": jax.random.PRNGKey(2)} if train else None,
        mutable=["batch_stats"] if train else False,
        **call_kw,
    )
    if train:
        out = out[0]
    return variables, out


@pytest.mark.parametrize("depth,top_filter,size", [(3, 8, 32), (5, 4, 64)])
def test_unet2d_shapes(depth, top_filter, size):
    model = UNet(depth=depth, top_filter=top_filter, p_dropout=0.0)
    x = jnp.zeros((2, size, size, 1))
    _, y = _init_apply(model, x)
    assert y.shape == (2, size, size, 1)
    yv = np.asarray(y)
    assert (yv >= 0).all() and (yv <= 1).all()  # sigmoid output


def test_unet2d_multiclass_softmax():
    model = UNet(depth=3, top_filter=4, out_channels=3, p_dropout=0.0)
    x = jnp.zeros((1, 16, 16, 1))
    _, y = _init_apply(model, x)
    assert y.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(y).sum(-1), 1.0, atol=1e-5)


def test_unet2d_no_final_activation():
    model = UNet(depth=3, top_filter=4, use_final_activation=False, p_dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 1))
    _, y = _init_apply(model, x)
    assert np.asarray(y).min() < 0  # raw logits


@pytest.mark.slow
def test_unet3d_shapes():
    model = UNet(depth=3, ndim=3, top_filter=4, p_dropout=0.0)
    x = jnp.zeros((1, 16, 16, 16, 1))
    _, y = _init_apply(model, x)
    assert y.shape == (1, 16, 16, 16, 1)


def test_unet_bilinear():
    model = UNet(depth=3, top_filter=4, bilinear=True, p_dropout=0.0)
    x = jnp.zeros((1, 32, 32, 1))
    variables, y = _init_apply(model, x)
    assert y.shape == (1, 32, 32, 1)
    # bilinear path has no transposed-conv params
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    assert not any("up_samp" in jax.tree_util.keystr(p) for p, _ in flat)


@pytest.mark.slow
def test_unet_bottleneck_and_train_mode():
    model = UNet(depth=3, top_filter=4, p_dropout=0.3)
    x = jnp.zeros((2, 32, 32, 1))
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, x)
    (y, bn), _ = model.apply(
        variables, x, train=True, return_bottleneck=True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    # depth 3: two pools -> 8x8 spatial, 4*2^2 = 16 channels at bottleneck
    assert bn.shape == (2, 8, 8, 16)
    assert y.shape == (2, 32, 32, 1)


def test_encoder_shapes():
    model = UNetEncoder(depth=3, top_filter=4, mlp_head=(32, 16), p_dropout=0.0)
    x = jnp.zeros((2, 32, 32, 1))
    _, z = _init_apply(model, x)
    assert z.shape == (2, 16)


def test_partial_unet_shapes():
    model = PartialUNet(depth=4, n_decoder=2, top_filter=4, head_channel=(8, 4), p_dropout=0.0)
    x = jnp.zeros((2, 32, 32, 1))
    _, f = _init_apply(model, x)
    # depth 4: 3 pools -> 4x4 bottleneck; 2 decoder stages -> 16x16
    assert f.shape == (2, 16, 16, 4)


def test_encoder_params_transfer_by_path():
    """Encoder param paths must be identical across UNet / UNetEncoder /
    PartialUNet so key-intersection weight transfer works (reference
    transfer_weights, UNet2D.py:316-337)."""
    x2 = jnp.zeros((1, 32, 32, 1))
    kw = dict(depth=3, top_filter=4, p_dropout=0.0)
    v_unet = UNet(**kw).init(jax.random.PRNGKey(0), x2)
    v_enc = UNetEncoder(mlp_head=(8,), **kw).init(jax.random.PRNGKey(1), x2)
    v_part = PartialUNet(n_decoder=1, head_channel=(4,), **kw).init(jax.random.PRNGKey(2), x2)

    def enc_paths(vars_):
        flat = jax.tree_util.tree_leaves_with_path(vars_["params"])
        return {
            jax.tree_util.keystr(p): v.shape
            for p, v in flat
            if "encoder" in jax.tree_util.keystr(p)
        }

    pu, pe, pp = enc_paths(v_unet), enc_paths(v_enc), enc_paths(v_part)
    assert pu == pe == pp
    assert len(pu) > 0


def test_groupnorm_variant():
    model = UNet(depth=3, top_filter=8, norm="group", p_dropout=0.0)
    x = jnp.zeros((2, 16, 16, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    assert "batch_stats" not in variables
    y = model.apply(variables, x)
    assert y.shape == (2, 16, 16, 1)
