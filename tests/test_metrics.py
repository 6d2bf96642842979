import numpy as np
import jax.numpy as jnp

from ich_tpu.ops import metrics


def test_confusion_matrix_counts():
    pred = jnp.asarray([[1, 1, 0, 0], [1, 0, 1, 0]], dtype=jnp.float32)
    targ = jnp.asarray([[1, 0, 1, 0], [1, 1, 1, 1]], dtype=jnp.float32)
    tn, fp, fn, tp = metrics.batch_binary_confusion_matrix(pred, targ)
    np.testing.assert_array_equal(np.asarray(tp), [1, 2])
    np.testing.assert_array_equal(np.asarray(tn), [1, 0])
    np.testing.assert_array_equal(np.asarray(fp), [1, 0])
    np.testing.assert_array_equal(np.asarray(fn), [1, 2])


def test_confusion_matrix_random_vs_numpy():
    rng = np.random.default_rng(0)
    p = (rng.uniform(size=(5, 8, 8)) > 0.5).astype(np.float32)
    t = (rng.uniform(size=(5, 8, 8)) > 0.5).astype(np.float32)
    tn, fp, fn, tp = metrics.batch_binary_confusion_matrix(jnp.asarray(p), jnp.asarray(t))
    P, T = p.reshape(5, -1), t.reshape(5, -1)
    np.testing.assert_array_equal(np.asarray(tp), (P * T).sum(1))
    np.testing.assert_array_equal(np.asarray(tn), ((1 - P) * (1 - T)).sum(1))
    np.testing.assert_array_equal(np.asarray(fp), (P * (1 - T)).sum(1))
    np.testing.assert_array_equal(np.asarray(fn), ((1 - P) * T).sum(1))


def test_dice_formula():
    # (2*TP+1)/(2*TP+FP+FN+1), reference UNet2D.py:250
    d = metrics.dice_from_counts(jnp.asarray(10.0), jnp.asarray(2.0), jnp.asarray(3.0))
    np.testing.assert_allclose(float(d), 21.0 / 26.0)
    # empty prediction & target -> Dice 1 (smoothing)
    d0 = metrics.dice_from_counts(jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0))
    assert float(d0) == 1.0


def test_iou_formula():
    v = metrics.iou_from_counts(jnp.asarray(9.0), jnp.asarray(3.0), jnp.asarray(4.0))
    np.testing.assert_allclose(float(v), 10.0 / 17.0)


def test_volume_dice_groupby():
    # 4 slices in 2 volumes; volume dice = dice of per-volume summed counts
    tp = jnp.asarray([1.0, 2.0, 0.0, 5.0])
    fp = jnp.asarray([0.0, 1.0, 2.0, 0.0])
    fn = jnp.asarray([1.0, 0.0, 1.0, 1.0])
    vid = jnp.asarray([0, 0, 1, 1])
    vd = metrics.volume_dice(tp, fp, fn, vid, num_volumes=2)
    np.testing.assert_allclose(
        np.asarray(vd),
        [(2 * 3 + 1) / (2 * 3 + 1 + 1 + 1), (2 * 5 + 1) / (2 * 5 + 2 + 2 + 1)],
    )


def test_dice_all_and_positive():
    vd = jnp.asarray([1.0, 0.5, 0.25, 1.0])
    has_ich = jnp.asarray([False, True, True, False])
    d_all, d_pos = metrics.dice_all_and_positive(vd, has_ich)
    np.testing.assert_allclose(float(d_all), 0.6875)
    np.testing.assert_allclose(float(d_pos), 0.375)


def test_fold_aggregate():
    mean, ci = metrics.fold_aggregate(np.asarray([0.5, 0.7]))
    np.testing.assert_allclose(mean, 0.6)
    np.testing.assert_allclose(ci, 1.96 * 0.1)


def test_classification_metrics():
    y = np.asarray([0, 0, 1, 1])
    s = np.asarray([0.1, 0.6, 0.4, 0.9])
    m = metrics.classification_metrics(y, s)
    assert m["accuracy"] == 0.5
    np.testing.assert_allclose(m["auc"], 0.75)


def test_pixel_auc_perfect():
    mask = np.zeros((8, 8))
    mask[2:4, 2:4] = 1
    heat = mask * 5.0 + 0.1
    assert metrics.pixel_auc(heat, mask) == 1.0
