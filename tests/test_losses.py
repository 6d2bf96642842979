"""Loss parity tests.

Where feasible the reference's own loss modules (pure math, imported from the
read-only checkout) are executed on CPU torch and compared against our jnp
implementations on identical random inputs — the strongest form of the
"objective semantics preserved bit-for-bit" requirement.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ich_tpu.ops import losses
from tests.conftest import REFERENCE_ROOT, reference_available

torch = pytest.importorskip("torch")

if reference_available():
    sys.path.insert(0, REFERENCE_ROOT)
    import src.models.optim.LossFunctions as ref_losses  # noqa: E402
else:  # pragma: no cover
    ref_losses = None

needs_ref = pytest.mark.skipif(not reference_available(), reason="no reference checkout")

rng = np.random.default_rng(42)


def _rand(shape, positive=False):
    x = rng.uniform(0.001, 0.999, size=shape).astype(np.float32)
    return x


def _mask(shape, frac=0.3):
    m = (rng.uniform(size=shape) < frac).astype(np.float32)
    return m


@needs_ref
@pytest.mark.parametrize("p,alpha,reduction", [(2, 1.0, "mean"), (1, 0.2, "mean"), (2, 0.5, "none"), (2, 1.0, "sum")])
def test_binary_dice_parity(p, alpha, reduction):
    pred = _rand((6, 1, 16, 16))
    mask = _mask((6, 1, 16, 16))
    mask[0] = 0  # one empty-mask sample to exercise the alpha branch
    ref = ref_losses.BinaryDiceLoss(reduction=reduction, p=p, alpha=alpha)(
        torch.from_numpy(pred), torch.from_numpy(mask)
    ).numpy()
    got = np.asarray(losses.binary_dice_loss(jnp.asarray(pred), jnp.asarray(mask), reduction=reduction, p=p, alpha=alpha))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@needs_ref
@pytest.mark.parametrize("alpha,beta,gamma", [(1.0, 0.5, 0.5), (0.2, 0.7, 0.3)])
def test_tversky_parity(alpha, beta, gamma):
    pred = _rand((4, 1, 12, 12))
    mask = _mask((4, 1, 12, 12))
    mask[1] = 0
    ref = ref_losses.TverskyLoss(alpha=alpha, beta=beta, gamma=gamma)(
        torch.from_numpy(pred), torch.from_numpy(mask)
    ).numpy()
    got = np.asarray(losses.tversky_loss(jnp.asarray(pred), jnp.asarray(mask), alpha=alpha, beta=beta, gamma=gamma))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@needs_ref
@pytest.mark.parametrize("alpha,beta", [(0.5, 0.5), (0.3, 0.8)])
def test_combo_parity(alpha, beta):
    pred = _rand((4, 1, 12, 12))
    mask = _mask((4, 1, 12, 12))
    ref = ref_losses.ComboLoss(alpha=alpha, beta=beta)(
        torch.from_numpy(pred), torch.from_numpy(mask)
    ).numpy()
    got = np.asarray(losses.combo_loss(jnp.asarray(pred), jnp.asarray(mask), alpha=alpha, beta=beta))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@needs_ref
@pytest.mark.parametrize("n,tau", [(8, 0.5), (16, 0.1)])
def test_info_nce_parity(n, tau):
    z1 = rng.normal(size=(n, 32)).astype(np.float32)
    z2 = rng.normal(size=(n, 32)).astype(np.float32)
    ref = ref_losses.InfoNCELoss(set_size=n, tau=tau, device="cpu")(
        torch.from_numpy(z1), torch.from_numpy(z2)
    ).numpy()
    got = np.asarray(losses.info_nce_loss(jnp.asarray(z1), jnp.asarray(z2), tau=tau))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=1e-5)


@needs_ref
def test_gdl_parity():
    im = _rand((3, 1, 16, 16))  # NCHW for reference
    rec = _rand((3, 1, 16, 16))
    ref = ref_losses.GDL(device="cpu", channels=1)(
        torch.from_numpy(im), torch.from_numpy(rec)
    ).numpy()
    # ours is NHWC
    got = np.asarray(
        losses.gdl_loss(jnp.asarray(im.transpose(0, 2, 3, 1)), jnp.asarray(rec.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@needs_ref
def test_gdl_parity_multichannel():
    im = _rand((2, 3, 12, 12))
    rec = _rand((2, 3, 12, 12))
    ref = ref_losses.GDL(device="cpu", channels=3)(
        torch.from_numpy(im), torch.from_numpy(rec)
    ).numpy()
    got = np.asarray(
        losses.gdl_loss(jnp.asarray(im.transpose(0, 2, 3, 1)), jnp.asarray(rec.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@needs_ref
def test_hsc_parity():
    x = rng.normal(size=(6, 1, 8, 8)).astype(np.float32)
    y = np.asarray([0, 1, 0, 1, 1, 0])
    ref = ref_losses.HSCLoss()(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    got = np.asarray(losses.hsc_loss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@needs_ref
def test_discounted_l1_parity():
    rec = _rand((2, 1, 24, 24))
    im = _rand((2, 1, 24, 24))
    mask = np.zeros((2, 1, 24, 24), dtype=np.float32)
    mask[0, 0, 4:12, 6:14] = 1  # rectangular inpaint region
    mask[1, 0, 10:20, 2:8] = 1
    ref = ref_losses.DiscountedL1(gamma=0.99, device="cpu")(
        torch.from_numpy(rec), torch.from_numpy(im), torch.from_numpy(mask)
    ).numpy()
    got = np.asarray(
        losses.discounted_l1_loss(
            jnp.asarray(rec.transpose(0, 2, 3, 1)),
            jnp.asarray(im.transpose(0, 2, 3, 1)),
            jnp.asarray(mask.transpose(0, 2, 3, 1)),
            gamma=0.99,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_local_info_nce_sanity():
    key = jax.random.PRNGKey(0)
    f = jax.random.normal(key, (2, 12, 12, 8))
    # identical views: positives are exact matches -> loss far below chance
    low = losses.local_info_nce_loss(f, f, jax.random.PRNGKey(1), K=3, n_region=4)
    other = jax.random.normal(jax.random.PRNGKey(2), (2, 12, 12, 8))
    high = losses.local_info_nce_loss(f, other, jax.random.PRNGKey(1), K=3, n_region=4)
    assert float(low) < float(high)
    chance = np.log(2 * 4 - 1)
    assert float(low) < chance


def test_sample_region_cells_distinct():
    cells = losses.sample_region_cells(jax.random.PRNGKey(0), batch=4, grid_cells=16, n_region=13)
    arr = np.asarray(cells)
    assert arr.shape == (4, 13)
    for row in arr:
        assert len(set(row.tolist())) == 13


def test_hinge_losses():
    d_real = jnp.asarray([2.0, 0.5])
    d_fake = jnp.asarray([-2.0, 0.0])
    # relu(1-2)=0, relu(1-0.5)=0.5 -> 0.25 ; relu(1-2)=0, relu(1+0)=1 -> 0.5
    np.testing.assert_allclose(float(losses.hinge_d_loss(d_real, d_fake)), 0.25 + 0.5)
    np.testing.assert_allclose(float(losses.hinge_g_loss(d_fake)), 1.0)


def test_weighted_bce_and_ce():
    logits = jnp.asarray([10.0, -10.0])
    labels = jnp.asarray([1.0, 0.0])
    assert float(losses.weighted_bce_with_logits(logits, labels)) < 1e-3
    lg = jnp.asarray([[5.0, -5.0], [-5.0, 5.0]])
    lb = jnp.asarray([0, 1])
    assert float(losses.softmax_cross_entropy(lg, lb)) < 1e-3
    w = jnp.asarray([1.0, 9.0])
    assert float(losses.softmax_cross_entropy(lg, lb, class_weights=w)) < 1e-3


def test_registry_names():
    from ich_tpu.utils.config import LOSSES

    for name in ["BinaryDiceLoss", "TverskyLoss", "ComboLoss", "InfoNCELoss",
                 "LocalInfoNCELoss", "DiscountedL1", "GDL", "HSCLoss"]:
        assert name in LOSSES
    fn = LOSSES.build("BinaryDiceLoss", p=2, alpha=0.2, reduction="mean", device="cuda")
    v = fn(jnp.ones((2, 4, 4)), jnp.ones((2, 4, 4)))
    np.testing.assert_allclose(float(v), 0.0, atol=1e-5)
