"""On-device transform semantics vs scipy golden references.

Random transforms are made deterministic by degenerate (low==high) ranges.
Fused-affine Compose intentionally resamples ONCE (higher fidelity than the
reference's chained scipy resampling), so chained comparisons use loose
tolerances; single-transform comparisons are tight.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.ndimage as ndi

from ich_tpu.ops import transforms as T

KEY = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)


def _img(h=32, w=32):
    return rng.uniform(0, 1, size=(h, w)).astype(np.float32)


def _mask(h=32, w=32):
    m = np.zeros((h, w), dtype=np.float32)
    m[8:20, 10:24] = 1
    return m


def test_translate_matches_scipy():
    img, mask = _img(), _mask()
    t = T.Translate(low=0.1, high=0.1)  # deterministic shift of 3.2 px
    oi, om = t(KEY, jnp.asarray(img[None]), jnp.asarray(mask[None]))
    want_i = ndi.shift(img, (3.2, 3.2), order=1)
    want_m = ndi.shift(mask, (3.2, 3.2), order=0)
    np.testing.assert_allclose(np.asarray(oi)[0], want_i, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(om)[0], want_m)


@pytest.mark.parametrize("angle", [20.0, -35.0])
def test_rotate_matches_scipy(angle):
    img = _img()
    t = T.Rotate(low=angle, high=angle)
    oi = t(KEY, jnp.asarray(img[None]))
    want = ndi.rotate(img, angle, axes=(1, 0), order=1, reshape=False)
    np.testing.assert_allclose(np.asarray(oi)[0], want, atol=1e-4)


def test_rotate_mask_nearest():
    mask = _mask()
    t = T.Rotate(low=90.0, high=90.0)
    _, om = t(KEY, jnp.asarray(mask[None]), jnp.asarray(mask[None]))
    want = ndi.rotate(mask, 90.0, axes=(1, 0), order=0, reshape=False)
    # 90° rotation is exact for order 0
    np.testing.assert_array_equal(np.asarray(om)[0], want)


@pytest.mark.parametrize("s", [1.15, 0.85])
def test_scale_close_to_reference_zoom(s):
    img = _img(40, 40)
    t = T.Scale(low=s, high=s)
    oi = np.asarray(t(KEY, jnp.asarray(img[None])))[0]
    # reference: zoom then center crop/pad (transforms.py:222-258)
    z = ndi.zoom(img, (s, s), order=1)
    ah = abs((round(s * 40) - 40) / 2)
    aw = abs((round(s * 40) - 40) / 2)
    al = [(int(np.floor(ah)), int(np.ceil(ah))), (int(np.floor(aw)), int(np.ceil(aw)))]
    if s >= 1:
        want = z[al[0][0] : z.shape[0] - al[0][1], al[1][0] : z.shape[1] - al[1][1]]
    else:
        want = np.pad(z, al)
    # interior agreement (coordinate conventions differ sub-pixel at edges)
    diff = np.abs(oi[4:-4, 4:-4] - want[4:-4, 4:-4])
    assert diff.mean() < 0.03


def test_hflip_vflip_exact():
    img, mask = _img(), _mask()
    oi, om = T.HFlip(p=1.0)(KEY, jnp.asarray(img[None]), jnp.asarray(mask[None]))
    np.testing.assert_allclose(np.asarray(oi)[0], np.flip(img, axis=1), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(om)[0], np.flip(mask, axis=1))
    oi2 = T.VFlip(p=1.0)(KEY, jnp.asarray(img[None]))
    np.testing.assert_allclose(np.asarray(oi2)[0], np.flip(img, axis=0), atol=1e-6)
    # p=0: identity
    oi3 = T.HFlip(p=0.0)(KEY, jnp.asarray(img[None]))
    np.testing.assert_allclose(np.asarray(oi3)[0], img, atol=1e-6)


def test_resize_orders():
    img, mask = _img(), _mask()
    oi, om = T.Resize(H=48, W=24)(KEY, jnp.asarray(img[None]), jnp.asarray(mask[None]))
    assert np.asarray(oi).shape == (1, 48, 24)
    m = np.asarray(om)[0]
    assert set(np.unique(m)) <= {0.0, 1.0}  # order-0 keeps masks binary


def test_gaussian_blur_matches_scipy():
    img = _img()
    t = T.GaussianBlur(p=1.0, sigma=(1.5, 1.5))
    oi = np.asarray(t(KEY, jnp.asarray(img[None])))[0]
    want = ndi.gaussian_filter(img, sigma=1.5, mode="nearest", truncate=4.0)
    np.testing.assert_allclose(oi, want, atol=1e-3)
    # p=0 identity
    t0 = T.GaussianBlur(p=0.0, sigma=(1.5, 1.5))
    np.testing.assert_allclose(
        np.asarray(t0(KEY, jnp.asarray(img[None])))[0], img, atol=1e-6
    )


def test_brightness_contrast():
    img = _img()
    ob = np.asarray(T.AdjustBrightness(p=1.0, low=0.2, high=0.2)(KEY, jnp.asarray(img[None])))[0]
    np.testing.assert_allclose(ob, np.clip(img + 0.2, 0, 1), atol=1e-6)
    oc = np.asarray(T.AdjustContrast(p=1.0, low=1.5, high=1.5)(KEY, jnp.asarray(img[None])))[0]
    np.testing.assert_allclose(oc, np.clip(img * 1.5, 0, 1), atol=1e-6)


def test_random_crop_resize_fallback_identity():
    img = _img()
    t = T.RandomCropResize(crop_scales=(0.999999, 1.0), crop_ratios=(1.0, 1.0))
    oi = np.asarray(t(KEY, jnp.asarray(img[None])))[0]
    np.testing.assert_allclose(oi, img, atol=1e-4)


def test_random_crop_resize_zooms():
    img = _img(64, 64)
    t = T.RandomCropResize(crop_scales=(0.25, 0.25), crop_ratios=(1.0, 1.0))
    oi = np.asarray(t(KEY, jnp.asarray(img[None])))[0]
    assert oi.shape == img.shape
    assert not np.allclose(oi, img)


def test_random_z_crop():
    vol = rng.uniform(size=(2, 16, 16, 20)).astype(np.float32)
    t = T.RandomZCrop(Z=8)
    out = np.asarray(t(KEY, jnp.asarray(vol)))
    assert out.shape == (2, 16, 16, 8)
    # crop must be a contiguous sub-block of the input
    found = any(
        np.allclose(out[0], vol[0][:, :, z : z + 8]) for z in range(20 - 8 + 1)
    )
    assert found


def test_patch_swap_permutes_pixels():
    img = np.arange(64 * 64, dtype=np.float32).reshape(64, 64) / (64 * 64)
    t = T.RandomPatchSwap(n=3, w=(6, 10), h=(6, 10), rotate=False)
    out = np.asarray(t(KEY, jnp.asarray(img[None])))[0]
    assert not np.allclose(out, img)
    # swapping permutes pixel values: multiset preserved
    np.testing.assert_allclose(np.sort(out.ravel()), np.sort(img.ravel()), atol=1e-6)


def test_patch_swap_rotate_mode():
    img = _img(64, 64)
    t = T.RandomPatchSwap(n=5, w=(8, 16), h=(8, 16), rotate=True)
    out = np.asarray(t(jax.random.PRNGKey(7), jnp.asarray(img[None])))[0]
    np.testing.assert_allclose(np.sort(out.ravel()), np.sort(img.ravel()), atol=1e-6)


def test_patch_swap_image_mask_consistent():
    img = _img(48, 48)
    t = T.RandomPatchSwap(n=2, w=(5, 9), h=(5, 9), rotate=False)
    oi, om = t(KEY, jnp.asarray(img[None]), jnp.asarray(img[None]))
    # identical inputs stay identical under identical swaps
    np.testing.assert_allclose(np.asarray(oi), np.asarray(om), atol=1e-6)


def test_compose_fuses_affines_single_resample():
    # smooth image: fused single-resample vs scipy's chained resampling agree
    # in the interior; boundaries differ by design (cval propagation)
    img = ndi.gaussian_filter(_img(), 2.0)
    mask = _mask()
    pipe = T.Compose(
        T.Translate(low=0.05, high=0.05),
        T.Rotate(low=15.0, high=15.0),
        T.HFlip(p=1.0),
    )
    oi, om = pipe(KEY, jnp.asarray(img[None]), jnp.asarray(mask[None]))
    want = ndi.shift(img, (1.6, 1.6), order=1)
    want = ndi.rotate(want, 15.0, axes=(1, 0), order=1, reshape=False)
    want = np.flip(want, axis=1)
    diff = np.abs(np.asarray(oi)[0] - want)
    assert diff[6:-6, 6:-6].max() < 0.02
    m = np.asarray(om)[0]
    assert set(np.unique(m)) <= {0.0, 1.0}


def test_compose_str_and_add():
    pipe = T.Compose(T.Rotate(), T.HFlip()) + T.Compose(T.Resize(H=16, W=16))
    s = str(pipe)
    assert "Rotate" in s and "Resize" in s
    assert len(pipe.transforms) == 3


def test_compose_image_only():
    img = _img()
    pipe = T.Compose(T.Rotate(low=5, high=5), T.AdjustBrightness(p=1.0, low=0.1, high=0.1))
    out = pipe(KEY, jnp.asarray(img[None]))
    assert np.asarray(out).shape == (1, 32, 32)


def test_registry_and_build_pipeline():
    from ich_tpu.utils.config import TRANSFORMS

    for name in ["Translate", "Rotate", "Scale", "HFlip", "VFlip", "Resize",
                 "GaussianBlur", "AdjustBrightness", "AdjustContrast",
                 "RandomCropResize", "RandomZCrop", "RandomPatchSwap",
                 "ToTorchTensor", "AdjustBrighness"]:
        assert name in TRANSFORMS
    pipe = T.build_pipeline({"Rotate": {"low": -5, "high": 5}, "HFlip": {"p": 0.5}})
    out = pipe(KEY, jnp.asarray(_img()[None]))
    assert np.asarray(out).shape == (1, 32, 32)


def test_matmul_warp_matches_gather():
    """The MXU two-pass warp agrees with the exact gather warp within the
    standard two-pass approximation tolerance (smooth data, small angles)."""
    from ich_tpu.ops.warp import affine_warp

    img = ndi.gaussian_filter(
        np.random.default_rng(0).uniform(size=(4, 64, 64)).astype(np.float32), 2.0,
        axes=(1, 2),
    )
    th = np.deg2rad(10.0)
    m = jnp.broadcast_to(
        jnp.asarray([[np.cos(th), np.sin(th)], [-np.sin(th), np.cos(th)]], jnp.float32),
        (4, 2, 2),
    )
    o = jnp.asarray(np.tile([[2.3, -1.7]], (4, 1)), jnp.float32)
    g = np.asarray(affine_warp(jnp.asarray(img), m, o, order=1, method="gather"))
    mm = np.asarray(affine_warp(jnp.asarray(img), m, o, order=1, method="matmul"))
    d = np.abs(g - mm)
    assert d.mean() < 1e-3
    assert d[:, 6:-6, 6:-6].max() < 0.05
    # flips are exact under both paths
    mf = jnp.broadcast_to(jnp.asarray([[1.0, 0.0], [0.0, -1.0]]), (4, 2, 2))
    o0 = jnp.zeros((4, 2))
    gf = np.asarray(affine_warp(jnp.asarray(img), mf, o0, order=1, method="gather"))
    mmf = np.asarray(affine_warp(jnp.asarray(img), mf, o0, order=1, method="matmul"))
    np.testing.assert_allclose(gf, mmf, atol=1e-5)


def test_jit_and_batch():
    """Whole pipeline under jit on a batch — the production path."""
    pipe = T.Compose(
        T.Translate(-0.05, 0.05), T.Rotate(-10, 10), T.Scale(0.95, 1.05),
        T.HFlip(0.5), T.AdjustBrightness(0.5, -0.1, 0.1),
    )
    imgs = jnp.asarray(rng.uniform(size=(8, 32, 32)).astype(np.float32))
    masks = jnp.asarray((rng.uniform(size=(8, 32, 32)) > 0.8).astype(np.float32))
    fn = jax.jit(lambda k, i, m: pipe(k, i, m))
    oi, om = fn(KEY, imgs, masks)
    assert oi.shape == imgs.shape and om.shape == masks.shape
    # different keys -> different augmentations
    oi2, _ = fn(jax.random.PRNGKey(1), imgs, masks)
    assert not np.allclose(np.asarray(oi), np.asarray(oi2))
    # per-sample randomness: augmented samples differ from each other
    same = jnp.broadcast_to(imgs[0], imgs.shape)
    oa, _ = fn(KEY, same, masks)
    assert not np.allclose(np.asarray(oa)[0], np.asarray(oa)[1])


def test_matmul_mask_warp_exact_for_shear_free_maps():
    """Order-0 two-pass matmul == exact nearest gather for translate /
    scale / flip (zero shear -> the two-pass coordinate factorization is
    exact), and outputs stay exactly binary."""
    from ich_tpu.ops.warp import affine_warp

    mask = (np.random.default_rng(1).uniform(size=(4, 32, 32)) > 0.7).astype(np.float32)
    cases = {
        "translate": (jnp.broadcast_to(jnp.eye(2), (4, 2, 2)),
                      jnp.asarray(np.tile([[3.3, -2.6]], (4, 1)), jnp.float32)),
        "scale": (jnp.broadcast_to(jnp.asarray([[1.17, 0.0], [0.0, 1.17]]), (4, 2, 2)),
                  jnp.zeros((4, 2))),
        "flip": (jnp.broadcast_to(jnp.asarray([[1.0, 0.0], [0.0, -1.0]]), (4, 2, 2)),
                 jnp.zeros((4, 2))),
    }
    for name, (m, o) in cases.items():
        g = np.asarray(affine_warp(jnp.asarray(mask), m, o, order=0, method="gather"))
        mm = np.asarray(affine_warp(jnp.asarray(mask), m, o, order=0, method="matmul"))
        assert set(np.unique(mm)) <= {0.0, 1.0}, name
        np.testing.assert_array_equal(g, mm, err_msg=name)


def test_matmul_mask_warp_rotation_boundary_jitter_only():
    """At a 15-degree rotation the two-pass nearest differs from the direct
    nearest only at mask-boundary pixels (sub-pixel source jitter), stays
    binary, and the mismatch fraction is small."""
    from ich_tpu.ops.warp import affine_warp
    import scipy.ndimage as sndi

    mask = np.zeros((1, 32, 32), dtype=np.float32)
    mask[0, 8:20, 10:24] = 1.0
    th = np.deg2rad(15.0)
    m = jnp.asarray([[[np.cos(th), np.sin(th)], [-np.sin(th), np.cos(th)]]], jnp.float32)
    o = jnp.zeros((1, 2))
    g = np.asarray(affine_warp(jnp.asarray(mask), m, o, order=0, method="gather"))[0]
    mm = np.asarray(affine_warp(jnp.asarray(mask), m, o, order=0, method="matmul"))[0]
    assert set(np.unique(mm)) <= {0.0, 1.0}
    diff = g != mm
    assert diff.mean() < 0.02
    # every differing pixel touches the gather result's boundary (a pixel
    # whose 3x3 neighborhood is not constant)
    interior = sndi.binary_erosion(g > 0.5, np.ones((3, 3)))
    exterior = sndi.binary_erosion(g < 0.5, np.ones((3, 3)))
    assert not (diff & (interior | exterior)).any()


def test_mask_warp_method_routing():
    from ich_tpu.ops.warp import mask_warp_method, _use_matmul_warp

    on_tpu = _use_matmul_warp()
    assert mask_warp_method(0.0) == ("matmul" if on_tpu else "gather")
    assert mask_warp_method(15.0) == ("matmul" if on_tpu else "gather")
    assert mask_warp_method(90.0) == "gather"  # near-vertical maps stay exact
