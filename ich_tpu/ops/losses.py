"""Objective functions, bit-compatible with the reference's semantics.

All losses are pure jnp functions (NHWC layout where spatial layout matters)
and are kept in float32 regardless of the network compute dtype — mixed
precision gates bf16 to conv compute only. Reference:
``code/src/models/optim/LossFunctions.py``.

Configured instances are exposed through the :data:`ich_tpu.utils.config.LOSSES`
registry under the reference's class names so JSON configs keep working.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ich_tpu.ops.distance import distance_to_set
from ich_tpu.utils.config import LOSSES


def _reduce(x: jax.Array, reduction: str) -> jax.Array:
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    if reduction == "none":
        return x
    raise ValueError(f"Unsupported reduction {reduction!r}")


def _batch_sum(x: jax.Array) -> jax.Array:
    """Sum over all non-batch axes."""
    return jnp.sum(x.reshape(x.shape[0], -1), axis=1)


# --------------------------------------------------------------------------
# Segmentation losses
# --------------------------------------------------------------------------

def binary_dice_loss(
    pred: jax.Array,
    mask: jax.Array,
    reduction: str = "mean",
    p: int = 2,
    alpha: float = 1.0,
    eps: float = 1.0,
) -> jax.Array:
    """1 - (2*sum(pred*mask)+eps)/(sum(pred^p)+sum(mask^p)+eps), with the
    empty-mask alpha reweighting (reference ``LossFunctions.py:14-63``;
    alpha applied at ``:56``)."""
    pred = pred.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    inter = _batch_sum(pred * mask)
    union = _batch_sum(pred**p) + _batch_sum(mask**p)
    dl = 1.0 - (2.0 * inter + eps) / (union + eps)
    dl = jnp.where(_batch_sum(mask) > 0, dl, alpha * dl)
    return _reduce(dl, reduction)


def tversky_loss(
    pred: jax.Array,
    mask: jax.Array,
    alpha: float = 1.0,
    beta: float = 0.5,
    gamma: float = 0.5,
    reduction: str = "mean",
    eps: float = 1.0,
) -> jax.Array:
    """1 - (TP+eps)/(TP + beta*FN + gamma*FP + eps), empty-mask alpha trick
    (reference ``LossFunctions.py:65-114``)."""
    pred = pred.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    tp = _batch_sum(pred * mask)
    fp = _batch_sum(pred * (1.0 - mask))
    fn = _batch_sum((1.0 - pred) * mask)
    tl = 1.0 - (tp + eps) / (tp + beta * fn + gamma * fp + eps)
    tl = jnp.where(_batch_sum(mask) > 0, tl, alpha * tl)
    return _reduce(tl, reduction)


def combo_loss(
    pred: jax.Array,
    mask: jax.Array,
    alpha: float = 0.5,
    beta: float = 0.5,
    reduction: str = "mean",
    p: int = 1,
) -> jax.Array:
    """alpha * beta-weighted BCE (summed per sample) + (1-alpha) * Dice
    (Asgari et al.; reference ``LossFunctions.py:116-166``). ``pred`` is a
    probability (post-sigmoid), matching the reference."""
    pred = pred.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    dice = binary_dice_loss(pred, mask, reduction="none", p=p)
    bce = -_batch_sum(
        beta * mask * jnp.log(pred + 1e-14)
        + (1.0 - beta) * (1.0 - mask) * jnp.log(1.0 - pred + 1e-14)
    )
    return _reduce(alpha * bce + (1.0 - alpha) * dice, reduction)


# --------------------------------------------------------------------------
# Contrastive losses
# --------------------------------------------------------------------------

def _cosine_sim_matrix(p: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Pairwise cosine similarity of rows of p: (N, D) -> (N, N)."""
    n = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), eps)
    return n @ n.T


def info_nce_loss(
    z1: jax.Array,
    z2: jax.Array,
    tau: float = 0.5,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """SimCLR NT-Xent (reference ``LossFunctions.py:168-230``).

    z1, z2: (N, D) two views. For each of the 2N embeddings the positive is
    its counterpart view; the denominator runs over every other embedding
    (all k != i). Returns the mean cross-entropy over the 2N anchors —
    identical to the reference's ``CrossEntropyLoss(reduction='sum')/(2N)``.

    With ``axis_name`` set (inside shard_map/pmap), embeddings are
    all-gathered across the mesh axis first so negatives span the global
    batch — the TPU-native upgrade over the reference's single-device set.
    """
    if axis_name is not None:
        z1 = jax.lax.all_gather(z1, axis_name, tiled=True)
        z2 = jax.lax.all_gather(z2, axis_name, tiled=True)
    n = z1.shape[0]
    p = jnp.concatenate([z1, z2], axis=0).astype(jnp.float32)
    sim = _cosine_sim_matrix(p) / tau
    idx = jnp.arange(2 * n)
    pos_idx = jnp.where(idx < n, idx + n, idx - n)
    pos = sim[idx, pos_idx]
    # denominator: all k != i  (logsumexp with the diagonal masked out)
    neg_inf = jnp.finfo(jnp.float32).min
    sim_masked = jnp.where(jnp.eye(2 * n, dtype=bool), neg_inf, sim)
    logz = jax.scipy.special.logsumexp(sim_masked, axis=1)
    return jnp.mean(logz - pos)


def sample_region_cells(
    key: jax.Array, batch: int, grid_cells: int, n_region: int
) -> jax.Array:
    """Pick ``n_region`` distinct grid cells per batch element, uniformly at
    random (the static-shape equivalent of the reference's
    ``get_sample_region_mask``, ``LossFunctions.py:279-306``).
    Returns int32 (batch, n_region) cell indices."""
    keys = jax.random.split(key, batch)
    pick = lambda k: jax.random.permutation(k, grid_cells)[:n_region]
    return jax.vmap(pick)(keys)


def local_info_nce_loss(
    f1: jax.Array,
    f2: jax.Array,
    key: jax.Array,
    tau: float = 0.5,
    K: int = 3,
    n_region: int = 13,
) -> jax.Array:
    """Chaitanya-2020 local contrastive loss (reference
    ``LossFunctions.py:232-341``), fully batched.

    f1, f2: (B, H, W, C) feature maps of the two views. ``n_region``
    non-overlapping KxK regions are sampled per batch element (identical
    cells in both views); each region is flattened to a K*K*C vector and an
    NT-Xent runs across the 2*n_region regions *within* each batch element.
    The reference gathers regions with a host loop over labels; here the
    map is reshaped to its KxK cell grid and regions are gathered with one
    take_along_axis.
    """
    b, h, w, c = f1.shape
    gh, gw = h // K, w // K
    if gh * gw < n_region:
        # the reference errors loudly here too (np.random.choice without
        # replacement, LossFunctions.py:295); a short permutation would
        # silently duplicate cells and compute a meaningless loss
        raise ValueError(
            f"local_info_nce_loss: feature grid {gh}x{gw} has fewer cells "
            f"than n_region={n_region}; shrink n_region or K."
        )
    cells = sample_region_cells(key, b, gh * gw, n_region)  # (B, R)

    def to_cells(f):
        # (B, H, W, C) -> (B, gh*gw, K*K*C); drop the unaligned bottom/right
        # strip exactly like the reference's zero-padding of out-of-grid area.
        f = f[:, : gh * K, : gw * K, :]
        f = f.reshape(b, gh, K, gw, K, c).transpose(0, 1, 3, 2, 4, 5)
        return f.reshape(b, gh * gw, K * K * c)

    g1, g2 = to_cells(f1), to_cells(f2)
    take = lambda g: jnp.take_along_axis(g, cells[:, :, None], axis=1)
    r1, r2 = take(g1), take(g2)  # (B, R, KKC)

    p = jnp.concatenate([r1, r2], axis=1).astype(jnp.float32)  # (B, 2R, KKC)
    pn = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-8)
    sim = jnp.einsum("bid,bjd->bij", pn, pn) / tau  # (B, 2R, 2R)
    m = 2 * n_region
    idx = jnp.arange(m)
    pos_idx = jnp.where(idx < n_region, idx + n_region, idx - n_region)
    pos = jnp.take_along_axis(
        sim, jnp.broadcast_to(pos_idx[None, :, None], (b, m, 1)), axis=2
    )[..., 0]
    neg_inf = jnp.finfo(jnp.float32).min
    sim_masked = jnp.where(jnp.eye(m, dtype=bool)[None], neg_inf, sim)
    logz = jax.scipy.special.logsumexp(sim_masked, axis=2)
    return jnp.mean(logz - pos)


# --------------------------------------------------------------------------
# Reconstruction / GAN / AD losses
# --------------------------------------------------------------------------

def discounted_l1_loss(
    rec: jax.Array,
    im: jax.Array,
    mask: jax.Array,
    gamma: float = 0.99,
    reduction: str = "mean",
) -> jax.Array:
    """Discounted L1 (Yu et al. 2018; reference ``LossFunctions.py:343-409``).

    L1 on the masked region, weighted ``gamma**dist`` where dist is the
    euclidean distance of each masked pixel to the nearest border pixel
    (border = dilate(mask) - mask). Weight is 0 outside the mask (as in the
    reference code, its docstring notwithstanding). NHWC; mask (B, H, W, 1).
    The distance map uses the exact separable EDT in
    :mod:`ich_tpu.ops.distance` instead of the reference's per-sample cdist
    host loop.
    """
    rec = rec.astype(jnp.float32)
    im = im.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    m2d = m[..., 0]  # (B, H, W)
    # 3x3 dilation via max-pool, minus the mask -> just-outside border ring
    dil = jax.lax.reduce_window(
        m2d, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME"
    )
    border = dil - m2d
    dist = distance_to_set(border)  # (B, H, W)
    weight = (gamma**dist) * m2d
    l1 = jnp.abs(rec - im) * weight[..., None]
    return _reduce(l1, reduction)


def gdl_loss(
    im: jax.Array, rec: jax.Array, reduction: str = "mean"
) -> jax.Array:
    """Gradient-difference loss (reference ``LossFunctions.py:411-448``).

    Forward differences along H and W (zero padded on the leading edge),
    summed across channels before the abs — matching the reference's
    channel-repeated 3x3 conv kernels exactly. NHWC input.
    """
    im = im.astype(jnp.float32)
    rec = rec.astype(jnp.float32)

    def grads(x):
        s = jnp.sum(x, axis=-1)  # channel-summed, (B, H, W)
        gh = s - jnp.pad(s, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]  # d/dW
        gv = s - jnp.pad(s, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]  # d/dH
        return jnp.abs(gh), jnp.abs(gv)

    ih, iv = grads(im)
    rh, rv = grads(rec)
    loss = jnp.sum(jnp.abs(ih - rh) + jnp.abs(iv - rv), axis=(1, 2))
    return _reduce(loss, reduction)


def hsc_loss(x: jax.Array, y: jax.Array, reduction: str = "mean") -> jax.Array:
    """FCDD pseudo-Huber hypersphere loss (reference
    ``LossFunctions.py:450-470``). x: score map (B, ...); y: labels (B,),
    1 = anomaly."""
    x = x.astype(jnp.float32)
    ax = jnp.sqrt(x**2 + 1.0) - 1.0
    ax = jnp.mean(ax.reshape(x.shape[0], -1), axis=-1)
    loss = jnp.where(y == 1, -jnp.log(1.0 - jnp.exp(-ax) + 1e-31), ax)
    return _reduce(loss, reduction)


def hinge_d_loss(d_real: jax.Array, d_fake: jax.Array) -> jax.Array:
    """SN-PatchGAN discriminator hinge loss (reference
    ``SNPatchGAN.py:168``): mean(relu(1 - D(real))) + mean(relu(1 + D(fake)))."""
    return jnp.mean(jax.nn.relu(1.0 - d_real)) + jnp.mean(jax.nn.relu(1.0 + d_fake))


def hinge_g_loss(d_fake: jax.Array) -> jax.Array:
    """Generator hinge term: -mean(D(fake)) (reference ``SNPatchGAN.py:185``)."""
    return -jnp.mean(d_fake)


def weighted_bce_with_logits(
    logits: jax.Array, labels: jax.Array, pos_weight: float = 1.0
) -> jax.Array:
    """Class-weighted binary cross entropy on logits (used by the
    classification-pretraining trainers; reference ``Classifier.py``
    builds class-weighted CE at ``scripts/.../:121-122``)."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_np = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(pos_weight * labels * log_p + (1.0 - labels) * log_np)


def softmax_cross_entropy(
    logits: jax.Array, labels: jax.Array, class_weights: Optional[jax.Array] = None
) -> jax.Array:
    """CE on logits with optional per-class weights. (The reference's
    BinaryClassifier double-softmaxes — ``Classifier.py:147-148``, a known
    defect per SURVEY §2.10 — we apply softmax exactly once.)"""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    if class_weights is not None:
        w = class_weights[labels]
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)
    return jnp.mean(nll)


def mse_loss(pred: jax.Array, target: jax.Array, reduction: str = "mean") -> jax.Array:
    d = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    return _reduce(d, reduction)


def l1_loss(pred: jax.Array, target: jax.Array, reduction: str = "mean") -> jax.Array:
    d = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return _reduce(d, reduction)


# --------------------------------------------------------------------------
# Registry entries under the reference's class names
# --------------------------------------------------------------------------

def _factory(fn: Callable, **defaults) -> Callable:
    def make(**kwargs):
        cfg = {**defaults, **kwargs}
        cfg.pop("device", None)  # reference configs carry torch device strings
        return functools.partial(fn, **cfg)

    return make


LOSSES.add("BinaryDiceLoss", _factory(binary_dice_loss))
LOSSES.add("TverskyLoss", _factory(tversky_loss))
LOSSES.add("ComboLoss", _factory(combo_loss))
LOSSES.add("InfoNCELoss", lambda set_size=None, tau=0.5, **kw: functools.partial(info_nce_loss, tau=tau))
LOSSES.add(
    "LocalInfoNCELoss",
    lambda tau=0.5, K=3, n_region=13, **kw: functools.partial(
        local_info_nce_loss, tau=tau, K=K, n_region=n_region
    ),
)
LOSSES.add("DiscountedL1", _factory(discounted_l1_loss))
LOSSES.add("GDL", lambda reduction="mean", **kw: functools.partial(gdl_loss, reduction=reduction))
LOSSES.add("HSCLoss", _factory(hsc_loss))
LOSSES.add("MSELoss", _factory(mse_loss))
LOSSES.add("L1Loss", _factory(l1_loss))
# torch loss names used by the classification-pretraining configs
LOSSES.add(
    "CrossEntropyLoss",
    lambda weight=None, **kw: functools.partial(
        softmax_cross_entropy,
        class_weights=jnp.asarray(weight) if weight is not None else None,
    ),
)
LOSSES.add(
    "BCEWithLogitsLoss",
    lambda pos_weight=1.0, **kw: functools.partial(
        weighted_bce_with_logits,
        pos_weight=float(pos_weight) if not isinstance(pos_weight, (list, tuple)) else float(pos_weight[0]),
    ),
)
