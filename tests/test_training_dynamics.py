"""Training-dynamics parity: the reference's OWN `UNet2D` trainer (torch,
CPU) vs `ich_tpu.train.UNet2D` on identical synthetic data and identical
hyperparameters, compared on the final volumetric Dice (VERDICT r2 item 2;
reference anchor ``UNet2D.py:84-270``, Dice at ``:250,255-256``).

The reference trainer itself takes any torch Dataset returning
(image, mask, volID, sliceNo) — its own Dataset classes need the absent
skimage/nibabel stack, so a 15-line tensor adapter feeds it directly.
skimage/nibabel/torchvision are stubbed as empty modules: the trainer only
touches them on save paths we don't exercise.
"""

import sys
import types

import numpy as np
import pytest

from ich_tpu.data import synthetic_ich_slices
from ich_tpu.models import UNet
from ich_tpu.train.segmentation2d import UNet2D as IchUNet2D
from tests.conftest import REFERENCE_ROOT, reference_available

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

needs_ref = pytest.mark.skipif(not reference_available(), reason="no reference checkout")


def _stub(name):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)


def _import_reference_trainer():
    for m in ("skimage", "skimage.io", "skimage.transform", "skimage.filters",
              "nibabel", "torchvision", "torchvision.transforms"):
        _stub(m)
    sys.modules["skimage"].io = sys.modules["skimage.io"]
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from src.models.optim.UNet2D import UNet2D as RefUNet2D  # noqa: E402
    import src.models.networks.UNet as ref_unet  # noqa: E402
    import src.models.optim.LossFunctions as ref_losses  # noqa: E402

    return RefUNet2D, ref_unet, ref_losses


class _TensorAdapter(torch.utils.data.Dataset):
    """Feeds an ich_tpu SliceDataset2D to the reference trainer
    ((1,H,W) image, (1,H,W) mask, volID, sliceNo tuples)."""

    def __init__(self, ds):
        self.images = np.asarray(ds.images, np.float32)
        self.masks = np.asarray(ds.masks, np.float32)
        self.vol_ids = np.asarray(ds.vol_ids, np.int64)
        self.slice_nbrs = np.asarray(ds.slice_nbrs, np.int64)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        return (
            torch.from_numpy(self.images[i][None]),
            torch.from_numpy(self.masks[i][None]),
            int(self.vol_ids[i]),
            int(self.slice_nbrs[i]),
        )


# >=16 epochs: below that the reference's eval oscillates wildly (its
# train/eval BatchNorm statistics mismatch — dice 0.86@8ep, 0.07@12ep,
# 0.93@16ep on this task) while its train loss decreases monotonically
HP = dict(n_epoch=20, batch_size=8, lr=5e-3, weight_decay=1e-6)
NET = dict(depth=3, top_filter=8, p_dropout=0.0)


@needs_ref
def test_training_dynamics_volumetric_dice_parity(tmp_path):
    RefUNet2D, ref_unet, ref_losses = _import_reference_trainer()
    import torch.optim as optim

    data = synthetic_ich_slices(n_slices=64, size=32, n_volumes=8, seed=5,
                                positive_frac=0.7)

    # --- reference trainer, CPU torch
    torch.manual_seed(0)
    tnet = ref_unet.UNet(in_channels=1, out_channels=1, **NET)
    ref_tr = RefUNet2D(
        tnet, lr_scheduler=optim.lr_scheduler.ExponentialLR,
        lr_scheduler_kwargs=dict(gamma=0.96),
        loss_fn=ref_losses.BinaryDiceLoss,
        loss_fn_kwargs=dict(reduction="mean", p=2, alpha=1.0),
        device="cpu", **HP,
    )
    ds_t = _TensorAdapter(data)
    # a nonexistent path (not None): modern torch.load(None) raises
    # AttributeError, not the FileNotFoundError the reference catches
    ref_tr.train(ds_t, checkpoint_path=str(tmp_path / "no_ckpt.pt"))
    ref_tr.evaluate(ds_t, print_to_logger=False)
    ref_dice = ref_tr.outputs["eval"]["dice"]

    # --- ich_tpu trainer, same data + hyperparameters
    ich_tr = IchUNet2D(
        UNet(norm="batch", **NET), lr_scheduler="ExponentialLR",
        lr_scheduler_kwargs={"gamma": 0.96}, loss_fn="BinaryDiceLoss",
        loss_fn_kwargs={"reduction": "mean", "p": 2, "alpha": 1.0},
        seed=0, **HP,
    )
    ich_tr.train(data)
    ich_tr.evaluate(data, print_to_logger=False)
    ich_dice = ich_tr.outputs["eval"]["dice"]

    # both learn the task, and agree within the tolerance band
    assert ref_dice["all"] > 0.5, ref_dice
    assert ich_dice["all"] > 0.5, ich_dice
    assert abs(ich_dice["all"] - ref_dice["all"]) < 0.05, (ich_dice, ref_dice)
    assert abs(ich_dice["positive"] - ref_dice["positive"]) < 0.05, (ich_dice, ref_dice)

    # loss trajectories both decrease monotonically toward fit; absolute
    # final losses are NOT compared — different init schemes (torch kaiming
    # -uniform vs flax lecun-normal) give different convergence speed at
    # equal final Dice, and Dice is the reference's parity metric
    ref_ev = [e[1] for e in ref_tr.outputs["train"]["evolution"]]
    ich_ev = [e[1] for e in ich_tr.outputs["train"]["evolution"]]
    assert ref_ev[-1] < ref_ev[0] and ich_ev[-1] < ich_ev[0]


class _LabeledAdapter(torch.utils.data.Dataset):
    """Feeds a LabeledSliceDataset to the reference BinaryClassifier
    ((1,H,W) image, label, idx tuples — ``Classifier.py:137-142,221-224``)."""

    def __init__(self, ds):
        self.images = np.asarray(ds.images, np.float32)
        self.labels = np.asarray(ds.labels, np.int64)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        return torch.from_numpy(self.images[i][None]), int(self.labels[i]), i


@needs_ref
def test_classifier_training_dynamics_parity(tmp_path):
    """Reference BinaryClassifier (torch CPU, incl. its softmax-before-CE
    defect ``Classifier.py:147-148``) vs ich_tpu.train.BinaryClassifier on
    the same synthetic ICH-slice task: both must learn it and agree on the
    final ROC-AUC/accuracy within tolerance."""
    _import_reference_trainer()  # installs the skimage/nibabel stubs
    import torch.optim as optim

    from src.models.networks.UNet import UNet_Encoder as RefEncoder  # noqa: E402
    from src.models.optim.Classifier import BinaryClassifier as RefClf  # noqa: E402

    from ich_tpu.data.core import LabeledSliceDataset
    from ich_tpu.models import UNetEncoder
    from ich_tpu.train.classifier import BinaryClassifier

    data = synthetic_ich_slices(n_slices=64, size=32, n_volumes=8, seed=9,
                                positive_frac=0.5)
    labels = (np.asarray(data.masks).reshape(len(data.images), -1).sum(1) > 0)
    ds = LabeledSliceDataset(images=data.images, labels=labels.astype(np.int64))

    hp = dict(n_epoch=10, batch_size=8, lr=1e-3, weight_decay=1e-6)
    enc = dict(depth=3, top_filter=8, p_dropout=0.0)

    torch.manual_seed(0)
    tnet = RefEncoder(in_channels=1, MLP_head=[16, 2], **enc)
    ref_tr = RefClf(
        tnet, lr_scheduler=optim.lr_scheduler.ExponentialLR,
        lr_scheduler_kwargs=dict(gamma=0.95), device="cpu", **hp,
    )
    ref_tr.train(_LabeledAdapter(ds), checkpoint_path=str(tmp_path / "no.pt"))
    ref_auc, ref_acc, *_ = ref_tr.evaluate(
        _LabeledAdapter(ds), save_tsne=False, return_scores=True
    )

    ich_tr = BinaryClassifier(
        UNetEncoder(mlp_head=(16, 2), **enc), lr_scheduler="ExponentialLR",
        lr_scheduler_kwargs={"gamma": 0.95}, seed=0, **hp,
    )
    ich_tr.train(ds)
    m = ich_tr.evaluate(ds, print_to_logger=False)

    assert ref_auc > 0.9 and ref_acc > 0.85, (ref_auc, ref_acc)
    assert m["auc"] > 0.9 and m["accuracy"] > 0.85, m
    assert abs(m["auc"] - ref_auc) < 0.08, (m["auc"], ref_auc)
    assert abs(m["accuracy"] - ref_acc) < 0.12, (m["accuracy"], ref_acc)


SWAP = dict(n=4, w=(6, 12), h=(6, 12))


class _SwapAdapter(torch.utils.data.Dataset):
    """Feeds the reference ContextRestoration trainer using the reference's
    OWN RandomPatchSwap corruption ((target, corrupted, idx) tuples —
    ``ContextRestoration.py:151``, ``RSNA_dataset`` mode
    ``datasets.py:405-408``)."""

    def __init__(self, images, swap_tf):
        self.images = np.asarray(images, np.float32)
        self.swap_tf = swap_tf

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        im = self.images[i]
        corrupted = self.swap_tf(im)
        return torch.from_numpy(im[None]), torch.from_numpy(corrupted[None]), i


@needs_ref
def test_context_restoration_training_dynamics_parity(tmp_path):
    """Reference ContextRestoration (torch CPU, its own RandomPatchSwap
    corruption) vs ich_tpu's (on-device corruption): after training on the
    same slices, both must restore the SAME fixed corrupted set to within a
    comparable MSE (each far below the corruption baseline)."""
    _import_reference_trainer()  # installs the skimage/nibabel stubs
    import torch.optim as optim

    import src.dataset.transforms as ref_tf  # noqa: E402
    from src.models.optim.ContextRestoration import (  # noqa: E402
        ContextRestoration as RefCR,
    )

    from ich_tpu.data.core import SliceDataset2D
    from ich_tpu.train.ssl import ContextRestoration

    data = synthetic_ich_slices(n_slices=64, size=32, n_volumes=8, seed=11)
    images = np.asarray(data.images, np.float32)
    ds = SliceDataset2D(images=images, masks=np.zeros_like(images),
                        vol_ids=np.asarray(data.vol_ids),
                        slice_nbrs=np.asarray(data.slice_nbrs))

    # 25 epochs @ 2e-3: measured baseline 0.0668, ref 0.0129, ich 0.0076 —
    # both clear the 0.5x-baseline bar with margin
    hp = dict(n_epoch=25, batch_size=8, lr=2e-3, weight_decay=1e-6)

    torch.manual_seed(0)
    ref_unet_mod = sys.modules["src.models.networks.UNet"]
    tnet = ref_unet_mod.UNet(in_channels=1, out_channels=1, **NET)
    ref_tr = RefCR(tnet, lr_scheduler=optim.lr_scheduler.ExponentialLR,
                   lr_scheduler_kwargs=dict(gamma=0.95), device="cpu", **hp)
    swap_tf = ref_tf.RandomPatchSwap(n=SWAP["n"], w=list(SWAP["w"]),
                                     h=list(SWAP["h"]), rotate=False)
    ref_tr.train(_SwapAdapter(images, swap_tf),
                 checkpoint_path=str(tmp_path / "no.pt"))

    ich_tr = ContextRestoration(
        UNet(norm="batch", **NET), n_swap=SWAP["n"], swap_w=SWAP["w"],
        swap_h=SWAP["h"], swap_rotate=False, lr_scheduler="ExponentialLR",
        lr_scheduler_kwargs={"gamma": 0.95}, seed=0, **hp,
    )
    ich_tr.train(ds)

    # identical FIXED corrupted set for both models (reference transform,
    # seeded): restoration quality is the parity metric
    np.random.seed(123)
    corrupted = np.stack([swap_tf(im) for im in images])
    baseline = float(np.mean((corrupted - images) ** 2))

    with torch.no_grad():
        tnet.eval()
        ref_rec = tnet(torch.from_numpy(corrupted[:, None])).numpy()[:, 0]
    ref_mse = float(np.mean((ref_rec - images) ** 2))

    import jax
    import jax.numpy as jnp

    rec = jax.jit(lambda v, x: ich_tr.net.apply(v, x, train=False))(
        ich_tr._variables(), jnp.asarray(corrupted)[..., None]
    )
    ich_mse = float(np.mean((np.asarray(rec)[..., 0] - images) ** 2))

    assert ref_mse < 0.5 * baseline, (ref_mse, baseline)
    assert ich_mse < 0.5 * baseline, (ich_mse, baseline)
    # same order of restoration quality
    assert ich_mse < 3 * ref_mse and ref_mse < 3 * ich_mse, (ich_mse, ref_mse)


class _ImgAdapter(torch.utils.data.Dataset):
    """Feeds the reference AE trainer ((image, idx) tuples — ``AE.py:104``)."""

    def __init__(self, images):
        self.images = np.asarray(images, np.float32)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        return torch.from_numpy(self.images[i][None]), i


@needs_ref
def test_ae_training_dynamics_parity(tmp_path):
    """Reference AE (torch CPU, L1+L2+epoch-scheduled-GDL — ``AE.py:95-139``)
    vs ich_tpu.train.AE on the same normal slices, compared on the loss
    trajectory phase-by-phase: totals at the end of the L1+L2 phase and at
    the end of the GDL phase must land in the same band. (The λ=1 GDL term
    dominates the total by ~100x on this task in BOTH frameworks — a
    direct consequence of the parity-matched GDL definition — so recon
    quality alone is not a separating metric once GDL is on.)"""
    _import_reference_trainer()  # installs the skimage/nibabel stubs
    sys.modules["skimage"].img_as_ubyte = lambda x: x  # AE.py:19 import-time only
    import torch.optim as optim

    from src.models.networks.AE_net import AE_net as RefAENet  # noqa: E402
    from src.models.optim.AE import AE as RefAE  # noqa: E402

    from ich_tpu.data.core import LabeledSliceDataset
    from ich_tpu.models import AENet
    from ich_tpu.train.ae_trainer import AE

    data = synthetic_ich_slices(n_slices=64, size=32, n_volumes=8, seed=13,
                                positive_frac=0.0)  # normal slices only
    images = np.asarray(data.images, np.float32)
    ds = LabeledSliceDataset(images=images, labels=np.zeros(len(images), np.int64))

    net_kw = dict(latent_channels=16, n_conv=2, kernel_size=5)
    hp = dict(n_epoch=20, batch_size=8, lr=2e-3, weight_decay=1e-6,
              lambda_GDL={"0": 0.0, "10": 1.0})

    torch.manual_seed(0)
    # NB the reference spells it "bottelneck_channels" (AE_net.py:79)
    tnet = RefAENet(in_channels=1, bottelneck_channels=16, **net_kw)
    ref_tr = RefAE(tnet, lr_scheduler=optim.lr_scheduler.ExponentialLR,
                   lr_scheduler_kwargs=dict(gamma=0.95), device="cpu", **hp)
    ref_tr.train(_ImgAdapter(images), checkpoint_path=str(tmp_path / "no.pt"))

    ich_tr = AE(AENet(bottleneck_channels=16, **net_kw),
                lr_scheduler="ExponentialLR",
                lr_scheduler_kwargs={"gamma": 0.95}, seed=0, **hp)
    ich_tr.train(ds)

    ref_ev = ref_tr.outputs["train"]["evolution"]["data"]  # [ep, tot, l1, l2, gdl]
    ich_ev = ich_tr.outputs["train"]["evolution"]  # [ep, tot]
    spread = float(np.mean(np.abs(images - images.mean())))

    # end of the L1+L2 phase (epoch 10): both fit the recon task
    ref_pre, ich_pre = float(ref_ev[9][1]), float(ich_ev[9][1])
    assert ref_pre < spread, (ref_pre, spread)
    assert ich_pre < spread, (ich_pre, spread)
    assert ich_pre < 3 * ref_pre and ref_pre < 3 * ich_pre, (ich_pre, ref_pre)
    # GDL phase: λ=1 makes the (parity-matched) GDL term dominate — both
    # totals must jump into the SAME band, orders of magnitude above pre
    ref_post, ich_post = float(ref_ev[-1][1]), float(ich_ev[-1][1])
    assert ref_post > 5 * ref_pre and ich_post > 5 * ich_pre, (ref_post, ich_post)
    assert ich_post < 3 * ref_post and ref_post < 3 * ich_post, (ich_post, ref_post)


# the reference FCDD trainer consumes the same (image, label, idx) tuples
# as the classifier (``FCDD.py:96-97``) — _LabeledAdapter serves both


@needs_ref
def test_fcdd_training_dynamics_parity(tmp_path):
    """Reference FCDD (torch CPU, HSC loss on the VGG score map —
    ``FCDD.py:91-129``, AUC at ``:148-183``) vs ich_tpu.train.FCDD on the
    same labeled slices: both must separate lesion slices (AUC) and land
    their HSC loss in the same band."""
    _import_reference_trainer()  # installs the skimage/nibabel stubs
    sys.modules["skimage"].img_as_ubyte = lambda x: x  # FCDD.py:21 import-time only

    from src.models.networks.FCDD_net import FCDD_CNN_VGG as RefNet  # noqa: E402
    from src.models.optim.FCDD import FCDD as RefFCDD  # noqa: E402

    from ich_tpu.data.core import LabeledSliceDataset
    from ich_tpu.models import FCDD_CNN_VGG
    from ich_tpu.train.fcdd_trainer import FCDD as IchFCDD

    size = 32

    def make(seed, n):
        d = synthetic_ich_slices(n_slices=n, size=size, n_volumes=8, seed=seed,
                                 positive_frac=0.5)
        labels = (np.asarray(d.masks).reshape(n, -1).sum(-1) > 0).astype(np.int64)
        return np.asarray(d.images, np.float32), labels

    xtr, ytr = make(7, 64)
    xva, yva = make(99, 32)
    train_ds = LabeledSliceDataset(images=xtr, labels=ytr)
    valid_ds = LabeledSliceDataset(images=xva, labels=yva)

    hp = dict(n_epoch=12, batch_size=8, lr=1e-3, weight_decay=1e-6)

    torch.manual_seed(0)
    tnet = RefNet(in_shape=[1, size, size], bias=True)
    ref_tr = RefFCDD(tnet, lr_scheduler_kwargs=dict(gamma=0.95), device="cpu", **hp)
    ref_tr.train(_LabeledAdapter(train_ds), checkpoint_path=str(tmp_path / "no.pt"))
    _, ref_auc = ref_tr.validate(_LabeledAdapter(valid_ds))

    ich_tr = IchFCDD(FCDD_CNN_VGG(), artificial_anomaly=False, seed=0,
                     lr_scheduler_kwargs={"gamma": 0.95}, **hp)
    ich_tr.train(train_ds)
    ich_auc = ich_tr.validate(valid_ds)

    # both discriminate held-out lesion slices, to the same degree
    assert ref_auc > 0.9, ref_auc
    assert ich_auc > 0.9, ich_auc
    assert abs(ref_auc - ich_auc) < 0.1, (ref_auc, ich_auc)

    # HSC loss trajectories: both converge, finals in the same band
    ref_l = [r[1] for r in ref_tr.outputs["train"]["evolution"]["data"]]
    ich_l = [r[1] for r in ich_tr.outputs["train"]["evolution"]]
    assert ref_l[-1] < 0.3 * ref_l[0], ref_l
    assert ich_l[-1] < 0.3 * ich_l[0], ich_l
    assert ich_l[-1] < 3 * ref_l[-1] and ref_l[-1] < 3 * ich_l[-1], (ich_l[-1], ref_l[-1])


class _TwoViewAdapter(torch.utils.data.Dataset):
    """Feeds the reference Contrastive trainer ((view1, view2, idx) —
    ``Contrastive.py:130-133``) with views matched in distribution to
    ``Compose(RandomCropResize((0.4, 0.8), square), HFlip(0.5))``.

    NB jitter transforms are deliberately absent: at this toy scale the
    NT-Xent objective has a collapse attractor, and with brightness/
    contrast jitter the reference's own torch trainer falls into it
    deterministically (params move, embeddings collapse to z-std 1e-3,
    loss pinned at ln(2B-1)); crop+flip views keep BOTH frameworks in the
    escaping basin so trajectories are comparable."""

    def __init__(self, images, seed=0):
        self.images = np.asarray(images, np.float32)
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.images)

    def _view(self, im):
        h0, w0 = im.shape
        s = self.rng.uniform(0.4, 0.8)  # area scale, square aspect
        h = max(1, int(round(h0 * np.sqrt(s))))
        w = max(1, int(round(w0 * np.sqrt(s))))
        i = int(self.rng.integers(0, h0 - h + 1))
        j = int(self.rng.integers(0, w0 - w + 1))
        t = torch.from_numpy(im[i:i + h, j:j + w].copy())[None, None]
        v = torch.nn.functional.interpolate(
            t, size=(h0, w0), mode="bilinear", align_corners=False)[0, 0].numpy()
        if self.rng.random() < 0.5:
            v = v[:, ::-1].copy()
        return v.astype(np.float32)

    def __getitem__(self, i):
        im = self.images[i]
        return (torch.from_numpy(self._view(im)[None]),
                torch.from_numpy(self._view(im)[None]), i)


@needs_ref
def test_contrastive_training_dynamics_parity(tmp_path):
    """Reference global Contrastive (torch CPU, NT-Xent on the normalized
    encoder head — ``Contrastive.py:87-178``) vs ich_tpu.train.Contrastive,
    from IDENTICAL initial weights (torch init ported via
    ``ich_tpu.interop.torch_port``) on the same slices with
    distribution-matched crop+flip views: both must start at the chance
    plateau ln(2B-1) and escape it to the same loss band."""
    _import_reference_trainer()
    import torch.optim as toptim

    from src.models.networks.UNet import UNet_Encoder as RefEnc  # noqa: E402
    from src.models.optim.Contrastive import Contrastive as RefContrastive  # noqa: E402
    from src.models.optim.LossFunctions import InfoNCELoss  # noqa: E402

    import ich_tpu.ops.transforms as T
    from ich_tpu.data.core import LabeledSliceDataset
    from ich_tpu.interop import torch_port
    from ich_tpu.models import UNetEncoder
    from ich_tpu.train.ssl import Contrastive as IchContrastive

    n = 64
    data = synthetic_ich_slices(n_slices=n, size=32, n_volumes=8, seed=11,
                                positive_frac=0.5)
    images = np.asarray(data.images, np.float32)

    hp = dict(n_epoch=30, batch_size=8, lr=5e-3, weight_decay=1e-6)

    torch.manual_seed(0)
    tnet = RefEnc(depth=3, top_filter=8, in_channels=1, MLP_head=[32, 16],
                  p_dropout=0.0, use_3D=False)
    # .copy(): .numpy() aliases the live CPU tensors — without it the
    # "init" snapshot would silently become the reference's TRAINED weights
    init_sd = {k: v.detach().cpu().numpy().copy()
               for k, v in tnet.state_dict().items()}
    ref_tr = RefContrastive(
        tnet, lr_scheduler=toptim.lr_scheduler.ExponentialLR,
        lr_scheduler_kwargs=dict(gamma=0.95), loss_fn=InfoNCELoss,
        loss_fn_kwargs=dict(set_size=hp["batch_size"], tau=0.5, device="cpu"),
        device="cpu", is_global=True, **hp)
    ref_tr.train(_TwoViewAdapter(images), checkpoint_path=str(tmp_path / "no.pt"))

    aug = T.Compose(T.RandomCropResize((0.4, 0.8), (1.0, 1.0)), T.HFlip(0.5))
    ich_tr = IchContrastive(
        UNetEncoder(depth=3, top_filter=8, mlp_head=(32, 16), p_dropout=0.0),
        is_global=True, tau=0.5, aug_pipeline=aug, seed=0,
        lr_scheduler_kwargs={"gamma": 0.95}, **hp)
    ich_tr.transfer_weights(torch_port.port_unet_encoder(init_sd))
    ich_tr.train(LabeledSliceDataset(images=images, labels=np.zeros(n, np.int64)))

    ref_l = [r[1] for r in ref_tr.outputs["train"]["evolution"]]
    ich_l = [float(r[1]) for r in ich_tr.outputs["train"]["evolution"]]
    chance = np.log(2 * hp["batch_size"] - 1)  # ln(15)

    # identical init -> both start on the chance plateau
    assert abs(ref_l[0] - chance) < 0.1, (ref_l[0], chance)
    assert abs(ich_l[0] - chance) < 0.1, (ich_l[0], chance)
    # both escape it (the collapse basin would pin the loss at `chance`)
    assert ref_l[-1] < chance - 0.5, ref_l
    assert ich_l[-1] < chance - 0.5, ich_l
    # finals in the same band (measured: ref 1.53, ich 1.80)
    assert ich_l[-1] < 1.6 * ref_l[-1] and ref_l[-1] < 1.6 * ich_l[-1], \
        (ich_l[-1], ref_l[-1])


class _AlignedTwoViewAdapter(torch.utils.data.Dataset):
    """Local-contrastive views ((view1, view2, idx)): crop-resize
    (0.7, 1.0) ONLY, matching the reference's local config
    (``LocalContrastive_config.json`` crop_scales [0.7, 1.0]) — local
    region correspondence needs roughly aligned views, so no flips."""

    def __init__(self, images, seed=0):
        self.images = np.asarray(images, np.float32)
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.images)

    def _view(self, im):
        h0, w0 = im.shape
        s = self.rng.uniform(0.7, 1.0)
        h = max(1, int(round(h0 * np.sqrt(s))))
        w = max(1, int(round(w0 * np.sqrt(s))))
        i = int(self.rng.integers(0, h0 - h + 1))
        j = int(self.rng.integers(0, w0 - w + 1))
        t = torch.from_numpy(im[i:i + h, j:j + w].copy())[None, None]
        v = torch.nn.functional.interpolate(
            t, size=(h0, w0), mode="bilinear", align_corners=False)[0, 0].numpy()
        return v.astype(np.float32)

    def __getitem__(self, i):
        im = self.images[i]
        return (torch.from_numpy(self._view(im)[None]),
                torch.from_numpy(self._view(im)[None]), i)


@needs_ref
def test_local_contrastive_training_dynamics_parity(tmp_path):
    """Reference local Contrastive (torch CPU, Partial_UNet + region
    NT-Xent — ``Contrastive.py:87-178``, ``LossFunctions.py:232-341``) vs
    ich_tpu.train.Contrastive(is_global=False) from identical ported init
    weights on matched crop-only views: both must converge the region
    InfoNCE into the same band. (NB the reference loss samples regions
    from its NCHW maps as if they were NHWC — a layout defect; ours uses
    the intended NHWC semantics. Both remain NT-Xent over 2R region
    vectors with the same chance level, so trajectory bands stay
    comparable.)"""
    _import_reference_trainer()
    import torch.optim as toptim

    from src.models.networks.UNet import Partial_UNet as RefPartial  # noqa: E402
    from src.models.optim.Contrastive import Contrastive as RefContrastive  # noqa: E402
    from src.models.optim.LossFunctions import LocalInfoNCELoss  # noqa: E402

    import ich_tpu.ops.transforms as T
    from ich_tpu.data.core import LabeledSliceDataset
    from ich_tpu.interop import torch_port
    from ich_tpu.models import PartialUNet
    from ich_tpu.train.ssl import Contrastive as IchContrastive

    n = 64
    data = synthetic_ich_slices(n_slices=n, size=32, n_volumes=8, seed=11,
                                positive_frac=0.5)
    images = np.asarray(data.images, np.float32)

    n_region, k_region, tau = 8, 3, 0.5
    netkw = dict(depth=3, n_decoder=1, top_filter=8, bilinear=False, p_dropout=0.0)
    hp = dict(n_epoch=20, batch_size=8, lr=1e-3, weight_decay=1e-6)

    torch.manual_seed(0)
    tnet = RefPartial(in_channels=1, use_3D=False, head_channel=[16, 8], **netkw)
    init_sd = {k: v.detach().cpu().numpy().copy()
               for k, v in tnet.state_dict().items()}
    ref_tr = RefContrastive(
        tnet, lr_scheduler=toptim.lr_scheduler.ExponentialLR,
        lr_scheduler_kwargs=dict(gamma=0.95), loss_fn=LocalInfoNCELoss,
        loss_fn_kwargs=dict(tau=tau, K=k_region, n_region=n_region, device="cpu"),
        device="cpu", is_global=False, **hp)
    ref_tr.train(_AlignedTwoViewAdapter(images), checkpoint_path=str(tmp_path / "no.pt"))

    ich_tr = IchContrastive(
        PartialUNet(head_channel=(16, 8), **netkw),
        is_global=False, tau=tau, n_region=n_region, K=k_region,
        aug_pipeline=T.Compose(T.RandomCropResize((0.7, 1.0), (1.0, 1.0))),
        seed=0, lr_scheduler_kwargs={"gamma": 0.95}, **hp)
    ich_tr.transfer_weights(torch_port.port_partial_unet(init_sd))
    ich_tr.train(LabeledSliceDataset(images=images, labels=np.zeros(n, np.int64)))

    ref_l = [r[1] for r in ref_tr.outputs["train"]["evolution"]]
    ich_l = [float(r[1]) for r in ich_tr.outputs["train"]["evolution"]]
    chance = np.log(2 * n_region - 1)

    # regions of one image correlate, so both start below chance and converge
    # (measured: ref 1.76 -> 0.93, ich 2.18 -> 1.04)
    assert ref_l[0] < chance and ich_l[0] < chance, (ref_l[0], ich_l[0], chance)
    assert ref_l[-1] < 0.7 * ref_l[0], ref_l
    assert ich_l[-1] < 0.7 * ich_l[0], ich_l
    assert ich_l[-1] < 1.5 * ref_l[-1] and ref_l[-1] < 1.5 * ich_l[-1], \
        (ich_l[-1], ref_l[-1])


class _ImageMaskAdapter(torch.utils.data.Dataset):
    """Feeds the reference SNPatchGAN trainer ((image, mask) —
    ``SNPatchGAN.py:150-152``) with inpainting masks sampled from a pool
    pre-drawn by ``ich_tpu.ops.masks.random_ff_masks`` — the SAME mask
    distribution the ich_tpu trainer draws on-device each step."""

    def __init__(self, images, mask_pool, seed=0):
        self.images = np.asarray(images, np.float32)
        self.masks = np.asarray(mask_pool, np.float32)
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        m = self.masks[self.rng.integers(0, len(self.masks))]
        return (torch.from_numpy(self.images[i][None]),
                torch.from_numpy(m[None]))


class _FixedPairAdapter(torch.utils.data.Dataset):
    """Reference GAN validation set ((image, mask, idx) —
    ``SNPatchGAN.py:250-258``)."""

    def __init__(self, images, masks):
        self.images = np.asarray(images, np.float32)
        self.masks = np.asarray(masks, np.float32)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        return (torch.from_numpy(self.images[i][None]),
                torch.from_numpy(self.masks[i][None]), i)


@needs_ref
def test_gan_training_dynamics_parity(tmp_path):
    """Reference SNPatchGAN (torch CPU, hinge D + DiscountedL1+hinge G —
    ``SNPatchGAN.py:150-196``) vs ich_tpu.train.SNPatchGAN on the same
    lesion-free slices with a matched free-form-mask distribution: the
    DiscountedL1 must improve in both and land in the same band, and the
    hinge D trajectories must track each other.

    96x96 inputs: the reference generator's dilation-16 bottleneck convs
    reflect-pad by 16, which needs a bottleneck >16px, i.e. inputs >64
    (``InpaintingNetwork.py`` dilated stack)."""
    _import_reference_trainer()
    sys.modules["skimage"].img_as_ubyte = lambda x: x  # SNPatchGAN.py import-time

    import jax

    from src.models.networks.InpaintingNetwork import (  # noqa: E402
        GatedGenerator as RefG, PatchDiscriminator as RefD)
    from src.models.optim.SNPatchGAN import SNPatchGAN as RefGAN  # noqa: E402

    from ich_tpu.models import GatedGenerator, PatchDiscriminator
    from ich_tpu.ops.masks import random_ff_masks
    from ich_tpu.train.gan import SNPatchGAN as IchGAN

    size = 96
    mask_kw = dict(n_draw=(1, 3), vertex=(2, 5), brush_width=(6, 12), length=(8, 20))
    data = synthetic_ich_slices(n_slices=64, size=size, n_volumes=8, seed=3,
                                positive_frac=0.0)
    images = np.asarray(data.images, np.float32)
    pool = np.asarray(random_ff_masks(jax.random.PRNGKey(42), 256, (size, size),
                                      **mask_kw))

    hp = dict(n_epoch=6, batch_size=8, lr_g=1e-3, lr_d=1e-3, gammaL1=0.99,
              lambda_L1=0.5, lambda_gan=0.5, weight_decay=1e-6)

    torch.manual_seed(0)
    tg = RefG(in_channels=2, out_channels=1, lat_channels=4,
              context_attention=False, return_coarse=True)
    td = RefD(in_channels=2, out_channels=[8, 16], kernel_size=3, stride=2,
              self_attention=False, sn=True)
    ref_tr = RefGAN(tg, td, lr_scheduler_kwargs=dict(gamma=0.95), device="cpu", **hp)
    ref_tr.train(_ImageMaskAdapter(images, pool),
                 valid_dataset=_FixedPairAdapter(images[:8], pool[:8]),
                 checkpoint_path=str(tmp_path / "no.pt"))
    rows = ref_tr.outputs["train"]["evolution"]["data"]  # [ep, L1, ganG, G, D, vl1]
    ref_l1 = [r[1] for r in rows]
    ref_d = [r[4] for r in rows]

    ich_tr = IchGAN(
        GatedGenerator(lat_channels=4, context_attention=False, return_coarse=True),
        PatchDiscriminator(out_channels=(8, 16), kernel_size=3, stride=2,
                           self_attention=False),
        mask_kwargs=mask_kw, seed=0, lr_scheduler_kwargs={"gamma": 0.95}, **hp)
    ich_tr.train(data)
    hist = ich_tr.outputs["train"]["evolution"]  # [ep, G, D, L1]
    ich_l1 = [float(r[3]) for r in hist]
    ich_d = [float(r[2]) for r in hist]

    # inpainting L1 improves in both, finals in the same band
    # (measured: ref 0.0149 -> 0.0088, ich 0.0171 -> 0.0134)
    assert ref_l1[-1] < 0.9 * ref_l1[0], ref_l1
    assert ich_l1[-1] < 0.9 * ich_l1[0], ich_l1
    assert ich_l1[-1] < 2.5 * ref_l1[-1] and ref_l1[-1] < 2.5 * ich_l1[-1], \
        (ich_l1[-1], ref_l1[-1])
    # hinge D finals track each other (measured |diff| ~ 0.006); per-epoch
    # values only need to be finite — early-epoch noise carries no parity
    # signal
    assert np.isfinite(ref_d).all() and np.isfinite(ich_d).all(), (ref_d, ich_d)
    assert 1.5 < ref_d[-1] < 2.5 and 1.5 < ich_d[-1] < 2.5, (ref_d[-1], ich_d[-1])
    assert abs(ref_d[-1] - ich_d[-1]) < 0.3, (ref_d[-1], ich_d[-1])
