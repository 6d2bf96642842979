"""Anomaly-detection suite: masks, morphology, GAN, AE, FCDD, inpaint-AD."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ich_tpu.data import LabeledSliceDataset, synthetic_ich_slices, synthetic_rsna_slices
from ich_tpu.models import AENet, FCDD_CNN_VGG, GatedGenerator, PatchDiscriminator
from ich_tpu.ops import masks as M
from ich_tpu.ops import morphology as morph
from ich_tpu.train import AE, FCDD, InpaintAnomalyDetector, SNPatchGAN, robust_anomaly_detect
from ich_tpu.train.inpaint_ad import make_grid_masks

KEY = jax.random.PRNGKey(0)


# ---------------- masks ----------------

@pytest.mark.slow
def test_random_ff_mask_properties():
    m = np.asarray(M.random_ff_masks(KEY, 4, (64, 64)))
    assert m.shape == (4, 64, 64)
    assert set(np.unique(m)) <= {0.0, 1.0}
    assert (m.reshape(4, -1).sum(1) > 0).all()  # strokes drawn
    assert (m.mean(axis=(1, 2)) < 0.8).all()  # not everything masked
    m2 = np.asarray(M.random_ff_masks(jax.random.PRNGKey(1), 4, (64, 64)))
    assert not np.array_equal(m, m2)  # key-dependent


def test_draw_ellipses_properties():
    e = np.asarray(M.draw_ellipses_batch(KEY, 3, (64, 64), n_ellipse=(2, 6),
                                         major_axis=(4, 12), minor_axis=(4, 12),
                                         intensity=(0.5, 1.0)))
    assert e.shape == (3, 64, 64)
    assert (e >= 0).all() and (e <= 1).all()
    assert (e.reshape(3, -1).max(1) >= 0.5).all()
    # with noise stays in range
    en = np.asarray(M.draw_ellipses(KEY, (32, 32), noise=0.1))
    assert (en >= 0).all() and (en <= 1).all()


# ---------------- morphology ----------------

def test_morphology_ops():
    m = np.zeros((16, 16), np.float32)
    m[6:10, 6:10] = 1
    d = np.asarray(morph.dilation(jnp.asarray(m)))
    assert d.sum() == 36  # 4x4 -> 6x6
    e = np.asarray(morph.erosion(jnp.asarray(m)))
    assert e.sum() == 4  # 4x4 -> 2x2
    np.testing.assert_array_equal(np.asarray(morph.opening(jnp.asarray(m))), m)
    np.testing.assert_array_equal(np.asarray(morph.closing(jnp.asarray(m))), m)


def test_hysteresis_threshold():
    x = np.zeros((16, 16), np.float32)
    x[2:6, 2:6] = 0.6        # weak blob connected to a strong pixel
    x[3, 3] = 1.0
    x[10:12, 10:12] = 0.6    # weak blob with NO strong seed
    out = np.asarray(morph.hysteresis_threshold(jnp.asarray(x), 0.5, 0.9))
    assert out[2:6, 2:6].all()
    assert not out[10:12, 10:12].any()


# ---------------- GAN trainer ----------------

@pytest.fixture(scope="module")
def tiny_gan():
    g = GatedGenerator(lat_channels=4, context_attention=False, return_coarse=True)
    d = PatchDiscriminator(out_channels=(8, 16), kernel_size=3, stride=2,
                           self_attention=False)
    data = synthetic_ich_slices(n_slices=16, size=32, n_volumes=2, seed=0)
    gan = SNPatchGAN(g, d, n_epoch=2, batch_size=8, lr_g=1e-3, lr_d=1e-3,
                     mask_kwargs=dict(n_draw=(1, 3), vertex=(2, 5),
                                      brush_width=(4, 8), length=(4, 10)))
    gan.train(data)
    return gan, data


@pytest.mark.slow
def test_gan_training_runs(tiny_gan):
    gan, data = tiny_gan
    hist = gan.outputs["train"]["evolution"]
    assert len(hist) == 2
    assert all(np.isfinite(h[1]) and np.isfinite(h[2]) for h in hist)


@pytest.mark.slow
def test_gan_inpaint_composites(tiny_gan):
    gan, data = tiny_gan
    imgs = data.images[:2]
    m = np.zeros((2, 32, 32), np.float32)
    m[:, 10:20, 10:20] = 1
    out = gan.inpaint(imgs, m)
    assert out.shape == (2, 32, 32, 1)
    # outside the mask the image is untouched (composite semantics)
    np.testing.assert_allclose(out[..., 0] * (1 - m), imgs * (1 - m), atol=1e-5)


@pytest.mark.slow
def test_gan_save_load_roundtrip(tiny_gan, tmp_path):
    gan, data = tiny_gan
    path = str(tmp_path / "gan.bin")
    gan.save_model(path)
    g2 = GatedGenerator(lat_channels=4, context_attention=False, return_coarse=True)
    d2 = PatchDiscriminator(out_channels=(8, 16), kernel_size=3, stride=2,
                            self_attention=False)
    gan2 = SNPatchGAN(g2, d2, batch_size=8)
    gan2.load_model(path, image_shape=(32, 32))
    m = np.zeros((1, 32, 32), np.float32)
    m[:, 8:16, 8:16] = 1
    np.testing.assert_allclose(
        gan.inpaint(data.images[:1], m), gan2.inpaint(data.images[:1], m), atol=1e-5
    )


# ---------------- AE trainer ----------------

@pytest.mark.slow
def test_ae_trainer():
    data = synthetic_ich_slices(n_slices=16, size=32, n_volumes=2, seed=1)
    ae = AE(AENet(latent_channels=4, bottleneck_channels=4, n_conv=2, kernel_size=3),
            n_epoch=3, batch_size=8, lr=1e-3)
    ae.train(data)
    hist = ae.outputs["train"]["evolution"]
    assert len(hist) == 3
    assert hist[-1][1] < hist[0][1]  # reconstruction improves


@pytest.mark.slow
def test_ae_trainer_gdl_schedule():
    """The epoch-keyed lambda_GDL schedule adds the (large-magnitude) GDL
    term starting at the scheduled epoch (reference AE.py:99-103)."""
    data = synthetic_ich_slices(n_slices=16, size=32, n_volumes=2, seed=1)
    ae = AE(AENet(latent_channels=4, bottleneck_channels=4, n_conv=2, kernel_size=3),
            lambda_GDL={"2": 0.5}, n_epoch=3, batch_size=8, lr=1e-3)
    ae.train(data)
    hist = ae.outputs["train"]["evolution"]
    assert hist[2][1] > 10 * hist[1][1]  # GDL term dominates once scheduled
    amap = ae.anomaly_map(data.images[:4])
    assert amap.shape == (4, 32, 32)
    assert (amap >= 0).all()
    l1 = ae.validate(data)
    assert np.isfinite(l1)


# ---------------- FCDD trainer ----------------

@pytest.mark.slow
def test_fcdd_trainer():
    ds = synthetic_rsna_slices(n_slices=32, size=32, seed=2, positive_frac=0.3)
    data = LabeledSliceDataset(ds.images, ds.labels[:, 0])
    f = FCDD(FCDD_CNN_VGG(), artificial_anomaly=True, anomaly_proba=0.5,
             drawing_params=dict(n_ellipse=(1, 4), major_axis=(3, 8), minor_axis=(3, 8),
                                 intensity=(0.6, 1.0)),
             n_epoch=2, batch_size=8, lr=1e-4)
    f.train(data)
    assert len(f.outputs["train"]["evolution"]) == 2
    scores = f.anomaly_scores(data.images[:8])
    assert scores.shape == (8,) and (scores >= 0).all()
    lo, hi = f.get_min_max(data.images[:8])
    assert hi >= lo
    heat = f.generate_heatmap(data.images[:4])
    assert heat.shape == (4, 32, 32)
    assert (heat >= 0).all() and (heat <= 1).all()
    auc = f.validate(data)
    assert np.isfinite(auc) or np.isnan(auc)
    # gradient heatmap alternative (reference FCDD_BaseNet.py:192-214)
    gh = f.grad_heatmap(data.images[:4])
    assert gh.shape == (4, 32, 32) and (gh >= 0).all() and gh.max() > 0
    gx = f.grad_heatmap(data.images[:4], method="xgrad", absolute=False)
    assert gx.shape == (4, 32, 32) and not np.array_equal(gx, gh)


# ---------------- inpainting AD ----------------

def test_grid_masks_uniform_coverage():
    g = make_grid_masks((32, 32), hole_size=(8, 8), step=8)
    cover = g.sum(axis=0)
    assert (cover == cover[0, 0]).all()  # every pixel equally covered
    assert g.shape == (4, 32, 32)


class _OracleInpainter:
    """Perfect inpainter for a known clean image: returns the clean content
    in the masked region — anomalies produce large inpainting error."""

    def __init__(self, clean):
        self.clean = jnp.asarray(clean, jnp.float32)[None, ..., None]

    def __call__(self, imgs, masks):
        return imgs * (1 - masks) + self.clean * masks


def test_inpaint_ad_detects_synthetic_anomaly():
    rng = np.random.default_rng(0)
    clean = rng.uniform(0.2, 0.4, size=(64, 64)).astype(np.float32)
    image = clean.copy()
    image[24:36, 24:36] = 0.95  # bright square anomaly
    det = InpaintAnomalyDetector(
        _OracleInpainter(clean), grid_hole=(16, 16), grid_step=8,
        batch_size=4, n_iter=1, early_stop=False,
    )
    mask = det.detect(image)
    assert mask.shape == (64, 64)
    anomaly_region = mask[24:36, 24:36]
    background = mask.copy()
    background[20:40, 20:40] = False
    assert anomaly_region.mean() > 0.5      # anomaly found
    assert background.mean() < 0.05         # few false positives


def test_inpaint_ad_wasserstein_mode():
    rng = np.random.default_rng(1)
    clean = rng.uniform(0.2, 0.4, size=(32, 32)).astype(np.float32)
    image = clean.copy()
    image[12:20, 12:20] = 0.95
    det = InpaintAnomalyDetector(
        _OracleInpainter(clean), grid_hole=(8, 8), grid_step=4,
        batch_size=4, n_iter=1, early_stop=False, use_wasserstein=True,
    )
    mask = det.detect(image)
    assert mask[12:20, 12:20].mean() > 0.5


def test_robust_anomaly_detect():
    rng = np.random.default_rng(2)
    clean = rng.uniform(0.2, 0.4, size=(32, 32)).astype(np.float32)
    image = clean.copy()
    image[12:20, 12:20] = 0.95
    det = InpaintAnomalyDetector(
        _OracleInpainter(clean), grid_hole=(8, 8), grid_step=4,
        batch_size=4, n_iter=1, early_stop=False,
    )
    final, amap = robust_anomaly_detect(image, det, angles_list=[7.5], flip=True)
    assert final.shape == (32, 32)
    assert 0 <= amap.min() and amap.max() <= 1
    assert final[14:18, 14:18].mean() > 0.5


# ---------------- reference parity (torch CPU, skimage stubbed) ----------------

def _import_reference_ad():
    """Import the reference's InpaintAnomalyDetector with skimage stubbed by
    FUNCTIONAL scipy.ndimage equivalents — the end-to-end detect() test runs
    the reference's own pipeline, so the morphology/hysteresis stubs must be
    real implementations, not empty modules."""
    import sys
    import types

    import scipy.ndimage as ndi

    from tests.conftest import REFERENCE_ROOT, reference_available

    if not reference_available():
        return None
    for name in ("skimage", "skimage.morphology", "skimage.filters",
                 "skimage.io", "skimage.exposure"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sk = sys.modules["skimage"]
    sk.morphology = sys.modules["skimage.morphology"]
    sk.filters = sys.modules["skimage.filters"]
    sk.io = sys.modules["skimage.io"]
    sk.exposure = sys.modules["skimage.exposure"]

    def disk(r):
        r = int(r)
        y, x = np.ogrid[-r:r + 1, -r:r + 1]
        return x * x + y * y <= r * r

    def hysteresis(im, low, high):
        im = np.asarray(im)
        low_mask = im > low
        lab, _ = ndi.label(low_mask)
        keep = np.unique(lab[(im > high) & low_mask])
        return np.isin(lab, keep[keep > 0])

    sk.morphology.disk = disk
    sk.morphology.binary_dilation = lambda m, selem=None: ndi.binary_dilation(m, structure=selem)
    sk.morphology.binary_closing = lambda m, selem=None: ndi.binary_closing(m, structure=selem)
    sk.morphology.binary_opening = lambda m, selem=None: ndi.binary_opening(m, structure=selem)
    sk.filters.apply_hysteresis_threshold = hysteresis
    sk.img_as_float = lambda m: np.asarray(m, np.float64)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import src.models.optim.InpaintAnomalyDetector as ref_ad

    return ref_ad


def test_grid_masks_match_reference():
    ref_ad = _import_reference_ad()
    if ref_ad is None:
        pytest.skip("no reference checkout")
    ours = make_grid_masks((64, 48), hole_size=(16, 16), step=8)
    ref = ref_ad.InpaintAnomalyDetector._get_grid_mask((64, 48), hole_size=(16, 16), step=8)
    np.testing.assert_array_equal(ours, ref.astype(np.float32))


def test_kl_divergence_matches_reference():
    ref_ad = _import_reference_ad()
    if ref_ad is None:
        pytest.skip("no reference checkout")
    import torch

    rng = np.random.default_rng(3)
    m1, m2 = rng.normal(size=(32, 32)), rng.normal(size=(32, 32))
    s1, s2 = rng.uniform(0.1, 2.0, (32, 32)), rng.uniform(0.1, 2.0, (32, 32))
    ours = np.asarray(
        InpaintAnomalyDetector.kl_divergence_normal(
            (jnp.asarray(m1, jnp.float32), jnp.asarray(s1, jnp.float32)),
            (jnp.asarray(m2, jnp.float32), jnp.asarray(s2, jnp.float32)),
        )
    )
    ref = ref_ad.InpaintAnomalyDetector.kl_divergence_normal(
        (torch.tensor(m1), torch.tensor(s1)), (torch.tensor(m2), torch.tensor(s2))
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_error_moments_match_reference():
    """One full error-sampling pass: the reference's _pixelwise_error raw
    sample and our masked-moment accumulation must agree on per-pixel
    mean/std given the SAME (weight-shared) inpainting function."""
    ref_ad = _import_reference_ad()
    if ref_ad is None:
        pytest.skip("no reference checkout")
    import torch

    class _FakeNet(torch.nn.Module):
        # deterministic stand-in generator: linear map of the masked image
        def forward(self, masked_im, mask):
            return 0.5 * masked_im + 0.25

        def to(self, device):
            return self

    def fake_inpaint(im, m):  # identical math, composite semantics
        im, m = np.asarray(im), np.asarray(m)
        masked = im * (1 - m)
        return masked + (0.5 * masked + 0.25) * m

    rng = np.random.default_rng(5)
    image = rng.uniform(0, 1, size=(32, 32)).astype(np.float32)
    grids = make_grid_masks((32, 32), hole_size=(8, 8), step=8)

    ref_det = ref_ad.InpaintAnomalyDetector(_FakeNet(), device="cpu", batch_size=4)
    err_ref = ref_det._pixelwise_error(torch.tensor(image).unsqueeze(0), grids)[:, 0]

    ours = InpaintAnomalyDetector(fake_inpaint, batch_size=4)
    mean, std, err, g = ours._error_moments(jnp.asarray(image), jnp.asarray(grids))
    np.testing.assert_allclose(np.asarray(mean), err_ref.mean(axis=0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(std), err_ref.std(axis=0), atol=1e-5)


def test_shuffle_ad_mask_loader_knob():
    """shuffle on/off must both converge to a fully-inpainted region; the
    order knob exists for the reference's upper-left-bias removal."""
    def fake_inpaint(im, m):
        im, m = np.asarray(im), np.asarray(m)
        return im * (1 - m) + 0.5 * m  # constant fill

    image = np.zeros((16, 16), np.float32)
    mask = np.zeros((16, 16), bool)
    mask[2:10, 3:12] = True
    for shuffle in (False, True):
        det = InpaintAnomalyDetector(
            fake_inpaint, shuffle_AD_mask_loader=shuffle, seed=1
        )
        out = det._inpaint_anomaly(image, mask, (8, 8))
        np.testing.assert_allclose(out[mask], 0.5)
        np.testing.assert_allclose(out[~mask], 0.0)


def test_detect_saves_reference_artifacts(tmp_path):
    def fake_inpaint(im, m):
        im, m = np.asarray(im), np.asarray(m)
        return im * (1 - m) + 0.3 * m

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (32, 32)).astype(np.float32)
    det = InpaintAnomalyDetector(
        fake_inpaint, grid_hole=(8, 8), grid_step=8, batch_size=4, n_iter=1,
        grid_anomaly_inpaint=((16, 16), (16, 16)),
    )
    out_dir = str(tmp_path / "steps")
    det.detect(img, save_dir=out_dir)
    import os

    for fn in ("D0.png", "mA0.png", "im_corrected_0.png",
               "D1.png", "mA1.png", "im_corrected_1.png"):
        assert os.path.exists(os.path.join(out_dir, fn)), fn


def test_make_grid_masks_non_multiple_shapes():
    """Shapes where dim % hole > step used to truncate the shifted slices
    to unequal sizes (np.stack crash); every pixel must be covered the
    same number of times regardless."""
    for shape, hole, step in [((63, 63), (32, 32), 16), ((31, 33), (32, 32), 16),
                              ((50, 70), (16, 16), 4)]:
        m = make_grid_masks(shape, hole_size=hole, step=step)
        assert m.shape[1:] == shape
        cov = m.sum(axis=0)
        assert cov.min() == cov.max() > 0


@pytest.mark.slow
def test_detect_end_to_end_matches_reference():
    """End-to-end weight-shared detect() parity: the reference's full
    pipeline (grid inpainting -> KL distance -> hysteresis -> dilation ->
    anomaly re-inpaint -> iterative cleanup, ``InpaintAnomalyDetector.py:
    95-228``) on its own torch GatedGenerator vs ich_tpu's detector on the
    SAME ported weights — the final anomaly masks must agree pixelwise.
    96x96: the generator's dilation-16 reflect pad needs a bottleneck
    >16px. ``shuffle_AD_mask_loader=False`` + KL mode keep both pipelines
    deterministic."""
    ref_ad = _import_reference_ad()
    if ref_ad is None:
        pytest.skip("no reference checkout")
    torch = pytest.importorskip("torch")

    from src.models.networks.InpaintingNetwork import GatedGenerator as RefG  # noqa: E402

    from ich_tpu.interop import torch_port

    size = 96
    rng = np.random.default_rng(0)
    clean = rng.uniform(0.2, 0.4, size=(size, size)).astype(np.float32)
    image = clean.copy()
    image[40:56, 36:52] = 0.95  # bright blob anomaly

    torch.manual_seed(0)
    tg = RefG(in_channels=2, out_channels=1, lat_channels=4,
              context_attention=False, return_coarse=False).eval()
    sd = {k: v.detach().cpu().numpy().copy() for k, v in tg.state_dict().items()}

    kw = dict(grid_hole=(16, 16), grid_step=8, inpainting_dilation_radius=(3, 3),
              cleaning_closing_radius=1, cleaning_opening_radius=1, n_iter=1,
              alpha01=0.0, alpha02=1.0, alpha1=1.0, alpha2=1.5,
              use_wasserstein=False, grid_anomaly_inpaint=((size, size), (size, size)),
              shuffle_AD_mask_loader=False, early_stop=False, batch_size=4)

    ref_det = ref_ad.InpaintAnomalyDetector(tg, device="cpu", **kw)
    ref_mask = np.asarray(ref_det.detect(torch.from_numpy(image[None])))

    g = GatedGenerator(lat_channels=4, context_attention=False, return_coarse=False)
    v = torch_port.port_gated_generator(sd, context_attention=False)

    @jax.jit
    def _inpaint(ims, ms):
        fine = g.apply(v, ims, ms, train=False)
        return ims * (1 - ms) + fine * ms

    ich_det = InpaintAnomalyDetector(
        lambda ims, ms: np.asarray(_inpaint(jnp.asarray(ims), jnp.asarray(ms))),
        **kw)
    ich_mask = np.asarray(ich_det.detect(image))

    # both find the planted blob...
    assert ref_mask[40:56, 36:52].mean() > 0.9, ref_mask.sum()
    assert ich_mask[40:56, 36:52].mean() > 0.9, ich_mask.sum()
    # ...and the full masks agree (measured: 99.6% agreement, IoU 0.873)
    assert (ref_mask == ich_mask).mean() > 0.97, (ref_mask.sum(), ich_mask.sum())
    union = np.logical_or(ref_mask, ich_mask).sum()
    iou = np.logical_and(ref_mask, ich_mask).sum() / union
    assert iou > 0.7, iou


@pytest.mark.slow
def test_robust_detect_end_to_end_matches_reference():
    """Weight-shared robust_anomaly_detect parity: the reference's
    rotation/flip ensembling + fraction-hysteresis merge
    (``InpaintAnomalyDetector.py:404-484``) vs ich_tpu's on the same
    ported generator — merged masks must agree pixelwise."""
    ref_ad = _import_reference_ad()
    if ref_ad is None:
        pytest.skip("no reference checkout")
    torch = pytest.importorskip("torch")

    from src.models.networks.InpaintingNetwork import GatedGenerator as RefG  # noqa: E402

    from ich_tpu.interop import torch_port

    size = 96
    rng = np.random.default_rng(0)
    clean = rng.uniform(0.2, 0.4, size=(size, size)).astype(np.float32)
    image = clean.copy()
    image[40:56, 36:52] = 0.95

    torch.manual_seed(0)
    tg = RefG(in_channels=2, out_channels=1, lat_channels=4,
              context_attention=False, return_coarse=False).eval()
    sd = {k: v.detach().cpu().numpy().copy() for k, v in tg.state_dict().items()}

    kw = dict(grid_hole=(16, 16), grid_step=8, inpainting_dilation_radius=(3, 3),
              cleaning_closing_radius=1, cleaning_opening_radius=1, n_iter=1,
              alpha01=0.0, alpha02=1.0, alpha1=1.0, alpha2=1.5,
              use_wasserstein=False, grid_anomaly_inpaint=((size, size), (size, size)),
              shuffle_AD_mask_loader=False, early_stop=False, batch_size=4)

    ref_det = ref_ad.InpaintAnomalyDetector(tg, device="cpu", **kw)
    ref_final, ref_map = ref_ad.robust_anomaly_detect(
        torch.from_numpy(image[None]), ref_det, angles_list=[7.5], flip=True)

    g = GatedGenerator(lat_channels=4, context_attention=False, return_coarse=False)
    v = torch_port.port_gated_generator(sd, context_attention=False)

    @jax.jit
    def _inpaint(ims, ms):
        fine = g.apply(v, ims, ms, train=False)
        return ims * (1 - ms) + fine * ms

    ich_det = InpaintAnomalyDetector(
        lambda ims, ms: np.asarray(_inpaint(jnp.asarray(ims), jnp.asarray(ms))),
        **kw)
    ich_final, ich_map = robust_anomaly_detect(image, ich_det,
                                               angles_list=[7.5], flip=True)
    ref_final, ich_final = np.asarray(ref_final), np.asarray(ich_final)

    assert ref_final[40:56, 36:52].mean() > 0.9, ref_final.sum()
    assert ich_final[40:56, 36:52].mean() > 0.9, ich_final.sum()
    assert (ref_final == ich_final).mean() > 0.97, (ref_final.sum(), ich_final.sum())
    # ensemble maps close everywhere (each entry is a detection frequency)
    assert float(np.abs(np.asarray(ref_map) - np.asarray(ich_map)).mean()) < 0.02
