"""SN-PatchGAN inpainting trainer (hinge GAN, two optimizers).

Reference ``code/src/models/optim/SNPatchGAN.py``: per batch — composite
fake ``im*(1-m) + fake*m`` (``:157-160``), D hinge step
``relu(1-D(real)) + relu(1+D(fake))`` (``:163-172``), then G step
``lambda_L1*(DiscountedL1(coarse) + DiscountedL1(fine)) +
lambda_gan*(-mean D(fake))`` (``:179-188``), separate Adam(β1=0.5)
optimizers + schedulers, per-batch logging, validation inpaint dumps,
``checkpoint_freq`` checkpoints.

TPU design: both updates run inside ONE jitted step (no host round-trips);
the free-form inpainting masks are generated on device per batch
(:func:`ich_tpu.ops.masks.random_ff_masks`) instead of in DataLoader
workers; spectral-norm power iterations live in the D variables
(``spectral_stats``) and update with the D step.
"""

from __future__ import annotations

import logging
import os
from datetime import timedelta
from functools import partial
from typing import Any, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ich_tpu.data.core import batch_indices
from ich_tpu.ops.losses import discounted_l1_loss, hinge_d_loss, hinge_g_loss
from ich_tpu.ops.masks import random_ff_masks
from ich_tpu.train import checkpoint as ckpt
from ich_tpu.train.loop import fit
from ich_tpu.train.state import make_optimizer, make_schedule
from ich_tpu.utils.config import TRAINERS
from ich_tpu.utils.logging import save_json

logger = logging.getLogger(__name__)


@flax.struct.dataclass
class GANState:
    g_params: Any
    g_stats: Any  # generator batch_stats
    g_opt: Any
    d_params: Any
    d_stats: Any  # discriminator {batch_stats, spectral_stats}
    d_opt: Any
    step: jax.Array


class SNPatchGAN:
    """Two-network inpainting GAN trainer with the reference's API:
    train / validate / save_model / load_model / save_outputs."""

    def __init__(
        self,
        generator,
        discriminator,
        n_epoch: int = 100,
        batch_size: int = 16,
        lr_g: float = 1e-3,
        lr_d: float = 1e-3,
        lr_scheduler: str = "ExponentialLR",
        lr_scheduler_kwargs: Optional[dict] = None,
        gammaL1: float = 0.99,
        lambda_L1: float = 0.5,
        lambda_gan: float = 0.5,
        weight_decay: float = 1e-6,
        mask_kwargs: Optional[dict] = None,
        seed: int = 0,
        checkpoint_freq: int = 3,
        num_workers: int = 0,  # config parity; unused
        device: Optional[str] = None,  # config parity; unused
        print_progress: bool = False,
    ):
        self.generator = generator
        self.discriminator = discriminator
        self.n_epoch = n_epoch
        self.batch_size = batch_size
        self.lr_g, self.lr_d = lr_g, lr_d
        self.lr_scheduler = lr_scheduler
        self.lr_scheduler_kwargs = dict(lr_scheduler_kwargs or {"gamma": 0.95})
        self.gammaL1 = gammaL1
        self.lambda_L1 = lambda_L1
        self.lambda_gan = lambda_gan
        self.weight_decay = weight_decay
        self.mask_kwargs = dict(mask_kwargs or {})
        self.seed = seed
        self.checkpoint_freq = checkpoint_freq
        self.print_progress = print_progress

        self.state: Optional[GANState] = None
        self._tx_g = self._tx_d = None
        self._tx_steps: Optional[int] = None  # steps_per_epoch the txs were built with
        self.outputs = {
            "train": {"time": None, "evolution": None},
            "eval": {"time": None, "l1_valid": None},
        }

    # -- state ----------------------------------------------------------------

    def _ensure_state(self, image_shape: Tuple[int, int], steps_per_epoch: Optional[int] = None):
        """``steps_per_epoch=None`` = schedule cadence irrelevant (load/eval);
        ``train()`` passes the real value and rebuilds the optimizers so
        per-epoch torch schedules decay per EPOCH, not per step."""
        if self._tx_g is None or (
            steps_per_epoch is not None and steps_per_epoch != self._tx_steps
        ):
            rebuilt = self._tx_g is not None
            self._tx_steps = steps_per_epoch
            spe = steps_per_epoch or 1
            sched_g = make_schedule(self.lr_scheduler, self.lr_g, spe, **self.lr_scheduler_kwargs)
            sched_d = make_schedule(self.lr_scheduler, self.lr_d, spe, **self.lr_scheduler_kwargs)
            # Adam(0.5, 0.999) as in the reference GAN setup
            self._tx_g = make_optimizer(sched_g, weight_decay=self.weight_decay, betas=(0.5, 0.999))
            self._tx_d = make_optimizer(sched_d, weight_decay=self.weight_decay, betas=(0.5, 0.999))
            if rebuilt and self.state is not None:
                self.state = self.state.replace(
                    g_opt=self._tx_g.init(self.state.g_params),
                    d_opt=self._tx_d.init(self.state.d_params),
                )
        if self.state is not None:
            return
        h, w = image_shape[:2]
        img = jnp.zeros((1, h, w, 1))
        mask = jnp.zeros((1, h, w, 1))
        kg, kd = jax.random.split(jax.random.PRNGKey(self.seed))
        g_vars = self.generator.init({"params": kg}, img, mask)
        d_vars = self.discriminator.init({"params": kd}, img, mask)
        self.state = GANState(
            g_params=g_vars["params"],
            g_stats=g_vars.get("batch_stats", {}),
            g_opt=self._tx_g.init(g_vars["params"]),
            d_params=d_vars["params"],
            d_stats={k: d_vars[k] for k in ("batch_stats", "spectral_stats") if k in d_vars},
            d_opt=self._tx_d.init(d_vars["params"]),
            step=jnp.zeros((), jnp.int32),
        )

    def _g_variables(self):
        v = {"params": self.state.g_params}
        if self.state.g_stats:
            v["batch_stats"] = self.state.g_stats
        return v

    # -- jitted step ------------------------------------------------------------

    def _make_train_step(self):
        G, D = self.generator, self.discriminator
        tx_g, tx_d = self._tx_g, self._tx_d
        lam_l1, lam_gan, gamma = self.lambda_L1, self.lambda_gan, self.gammaL1
        mask_kwargs = self.mask_kwargs

        @partial(jax.jit, donate_argnums=(0,))
        def step(state: GANState, images, key):
            if images.ndim == 3:
                images = images[..., None]
            b, h, w = images.shape[:3]
            km, kg = jax.random.split(key)
            masks = random_ff_masks(km, b, (h, w), **mask_kwargs)[..., None]

            def g_forward(g_params, g_stats):
                variables = {"params": g_params}
                mut = []
                if g_stats:
                    variables["batch_stats"] = g_stats
                    mut = ["batch_stats"]
                out = G.apply(variables, images, masks, train=True, mutable=mut)
                (fine, coarse), new = out
                return fine, coarse, new.get("batch_stats", {})

            # ---- D step (fake detached) ----
            fine0, _, _ = g_forward(state.g_params, state.g_stats)
            fake0 = jax.lax.stop_gradient(images * (1 - masks) + fine0 * masks)

            def d_loss_fn(d_params):
                variables = {"params": d_params, **state.d_stats}
                mut = list(state.d_stats.keys())
                d_real, new_stats = D.apply(variables, images, masks, train=True, mutable=mut)
                variables = {"params": d_params, **new_stats}
                d_fake, new_stats = D.apply(variables, fake0, masks, train=True, mutable=mut)
                return hinge_d_loss(d_real, d_fake), dict(new_stats)

            (d_loss, d_stats), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(state.d_params)
            d_updates, d_opt = tx_d.update(d_grads, state.d_opt, state.d_params)
            d_params = jax.tree_util.tree_map(lambda p, u: p + u, state.d_params, d_updates)

            # ---- G step (through the updated D, frozen D stats) ----
            def g_loss_fn(g_params):
                fine, coarse, g_stats = g_forward(g_params, state.g_stats)
                fake = images * (1 - masks) + fine * masks
                d_fake = D.apply({"params": d_params, **d_stats}, fake, masks, train=False)
                l1 = discounted_l1_loss(coarse, images, masks, gamma=gamma) + discounted_l1_loss(
                    fine, images, masks, gamma=gamma
                )
                loss = lam_l1 * l1 + lam_gan * hinge_g_loss(d_fake)
                return loss, (g_stats, l1)

            (g_loss, (g_stats, l1)), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(state.g_params)
            g_updates, g_opt = tx_g.update(g_grads, state.g_opt, state.g_params)
            g_params = jax.tree_util.tree_map(lambda p, u: p + u, state.g_params, g_updates)

            new_state = GANState(
                g_params, g_stats, g_opt, d_params, d_stats, d_opt, state.step + 1
            )
            return new_state, (g_loss, d_loss, l1)

        return step

    # -- public API ---------------------------------------------------------------

    def train(self, dataset, valid_dataset=None, checkpoint_path: Optional[str] = None,
              valid_path: Optional[str] = None, valid_freq: int = 5):
        """``dataset``: images container (.images (N,H,W)); inpainting masks
        are drawn on device each step."""
        n = len(dataset.images)
        h, w = dataset.images.shape[1:3]
        steps_per_epoch = max(1, n // self.batch_size)
        self._ensure_state((h, w), steps_per_epoch)
        step = self._make_train_step()
        images = dataset.images

        # resume convention: host shuffle rng seeded with seed + n_done,
        # created lazily on the first epoch fit() hands us post-restore
        rng_box = {}

        def batches_fn(epoch):
            if "rng" not in rng_box:
                rng_box["rng"] = np.random.default_rng(self.seed + epoch)
            return batch_indices(
                n, self.batch_size, shuffle=True, rng=rng_box["rng"], drop_last=True
            )

        def epoch_hook(state, epoch, mean_losses, epoch_time):
            self.state = state  # validate() below reads the live state
            means = mean_losses if mean_losses is not None else np.zeros(3)
            eg, ed, el1 = (float(v) for v in means)
            logger.info(
                "\t| Epoch: %03d/%03d | Time: %s | G loss: %.5f | D loss: %.5f | L1: %.5f |",
                epoch + 1, self.n_epoch, timedelta(seconds=int(epoch_time)),
                eg, ed, el1,
            )
            if valid_dataset is not None and (epoch + 1) % valid_freq == 0:
                self.validate(valid_dataset, save_path=valid_path, epoch=epoch + 1)
            return [epoch + 1, eg, ed, el1]

        self.state, history, wall = fit(
            self.state,
            lambda s, idx, k: step(s, jnp.asarray(images[idx]), k),
            batches_fn,
            self.n_epoch,
            seed=self.seed,
            checkpoint_path=checkpoint_path,
            checkpoint_freq=self.checkpoint_freq,
            name="SN-PatchGAN",
            epoch_hook=epoch_hook,
        )
        self.outputs["train"]["time"] = wall
        self.outputs["train"]["evolution"] = history

    def inpaint(self, images: np.ndarray, masks: np.ndarray) -> np.ndarray:
        """Composite inpainting of (B, H, W[,1]) images on mask==1 regions —
        the inference entry used by the anomaly detector
        (reference ``InpaintAnomalyDetector._inpaint:261-289``).

        The anomaly detector calls this hundreds of times per slice (one
        per grid batch × transform × cleanup iteration): the jitted program
        is built ONCE per trainer with the weights passed as arguments, so
        every call after the first is a cache hit, not a re-trace."""
        run = getattr(self, "_inpaint_jit", None)
        if run is None:
            G = self.generator

            @jax.jit
            def run(variables, imgs, msks):
                if imgs.ndim == 3:
                    imgs = imgs[..., None]
                if msks.ndim == 3:
                    msks = msks[..., None]
                fine, _ = G.apply(variables, imgs, msks, train=False)
                return imgs * (1 - msks) + fine * msks

            self._inpaint_jit = run
        return np.asarray(
            run(self._g_variables(), jnp.asarray(images), jnp.asarray(masks))
        )

    def validate(self, dataset, save_path: Optional[str] = None, epoch: int = 0):
        """Inpaint validation images (fixed masks from the dataset if
        provided, else random) and save side-by-side pngs + masked L1
        (reference ``SNPatchGAN.validate:246-295``)."""
        images = dataset.images[: self.batch_size]
        if getattr(dataset, "masks", None) is not None:
            masks = dataset.masks[: self.batch_size]
        else:
            masks = np.asarray(
                random_ff_masks(jax.random.PRNGKey(1234), len(images),
                                images.shape[1:3], **self.mask_kwargs)
            )
        out = self.inpaint(images, masks)
        l1 = float(np.abs((out[..., 0] - images) * masks).sum() / max(masks.sum(), 1))
        self.outputs["eval"]["l1_valid"] = l1
        if save_path:
            from PIL import Image

            os.makedirs(save_path, exist_ok=True)
            for i in range(min(8, len(images))):
                row = np.concatenate(
                    [images[i], masks[i], out[i, ..., 0]], axis=1
                )
                Image.fromarray((np.clip(row, 0, 1) * 255).astype(np.uint8)).save(
                    os.path.join(save_path, f"valid_ep{epoch}_{i}.png")
                )
        logger.info("Validation masked L1: %.5f", l1)
        return l1

    def get_state_dict(self) -> dict:
        return jax.tree_util.tree_map(
            np.asarray,
            {"generator": self._g_variables(),
             "discriminator": {"params": self.state.d_params, **self.state.d_stats}},
        )

    def save_model(self, export_fn: str) -> None:
        ckpt.save_params(export_fn, self.get_state_dict())

    def load_model(self, import_fn: str, image_shape=(256, 256)) -> None:
        self._ensure_state(image_shape)
        loaded = ckpt.load_params(import_fn, self.get_state_dict())
        g, d = loaded["generator"], loaded["discriminator"]
        self.state = self.state.replace(
            g_params=g["params"], g_stats=g.get("batch_stats", {}),
            d_params=d["params"],
            d_stats={k: d[k] for k in ("batch_stats", "spectral_stats") if k in d},
        )

    def save_outputs(self, export_fn: str) -> None:
        save_json(export_fn, self.outputs)


TRAINERS.add("SNPatchGAN", SNPatchGAN)
