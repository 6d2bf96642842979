"""Autoencoder anomaly-detection trainer.

Reference ``code/src/models/optim/AE.py``: reconstruction loss
``L1 + L2 + lambda_GDL(epoch) * GDL`` where ``lambda_GDL`` is an
epoch-keyed schedule dict (``:99-114``: lambda starts at 0 and is updated
whenever the current epoch appears in the dict); validation saves
side-by-side reconstruction images.
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ich_tpu.data.core import batch_indices
from ich_tpu.ops.losses import gdl_loss, l1_loss, mse_loss
from ich_tpu.train.loop import fit
from ich_tpu.train.ssl import _SSLBase
from ich_tpu.train.state import TrainState
from ich_tpu.utils.config import TRAINERS
from ich_tpu.utils import rng as rng_utils

logger = logging.getLogger(__name__)


class AE(_SSLBase):
    """Reconstruction AE on normal slices; anomaly score = |im - rec|."""

    def __init__(self, net, lambda_GDL: Optional[Dict[str, float]] = None, **kwargs):
        super().__init__(net, **kwargs)
        self.ep_GDL = {str(k): float(v) for k, v in (lambda_GDL or {}).items()}
        self.outputs["eval"] = {"time": None, "l1_valid": None}

    def _make_train_step(self):
        net, tx = self.net, self._tx
        has_bn = self.state.batch_stats is not None

        @partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
        def step(state, images, key, lambda_gdl):
            if images.ndim == 3:
                images = images[..., None]

            def loss_fn(params):
                variables = {"params": params}
                if has_bn:
                    variables["batch_stats"] = state.batch_stats
                out = net.apply(
                    variables, images, train=True, rngs={"dropout": rng_utils.dropout_key(key)},
                    mutable=["batch_stats"] if has_bn else [],
                )
                rec, mut = out
                l1 = l1_loss(rec, images)
                l2 = mse_loss(rec, images)
                gdl = gdl_loss(images, rec) if lambda_gdl > 0 else 0.0
                return l1 + l2 + lambda_gdl * gdl, (mut.get("batch_stats"), l1, l2, gdl)

            (loss, (new_stats, l1, l2, gdl)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
            return TrainState(new_params, new_stats, new_opt, state.step + 1), loss

        return step

    def train(self, dataset, valid_dataset=None, checkpoint_path: Optional[str] = None,
              valid_path: Optional[str] = None, valid_freq: int = 5):
        n = len(dataset.images)
        steps_per_epoch = max(1, n // self.batch_size)
        self._ensure_state(dataset.images.shape[1:], steps_per_epoch)
        self._dp_prepare()
        step = self._make_train_step()
        host_rng = np.random.default_rng(self.seed)
        images = dataset.images
        lambda_holder = {"v": 0.0}

        def batches_fn(epoch):
            # epoch-keyed GDL weight schedule (reference AE.py:99-103).
            # Evaluated as "largest schedule key <= epoch" so a checkpoint
            # resume past a schedule boundary replays the weight instead of
            # silently training the rest of the run with the initial 0.0
            past = [int(k) for k in self.ep_GDL if int(k) <= epoch]
            if past:
                v = float(self.ep_GDL[str(max(past))])
                if v != lambda_holder["v"]:
                    lambda_holder["v"] = v
                    logger.info("Lambda GDL set to %s.", lambda_holder["v"])
            for idx in batch_indices(n, self.batch_size, shuffle=True, rng=host_rng, drop_last=True):
                yield self._place(jnp.asarray(images[idx]))

        def train_step(state, batch, key):
            return step(state, batch, key, float(lambda_holder["v"]))

        def validate(state, epoch):
            if valid_dataset is None or (epoch + 1) % valid_freq != 0:
                return "", []
            self.state = state
            l1 = self.validate(valid_dataset, save_path=valid_path, epoch=epoch + 1)
            return f"| Valid L1: {l1:.5f} ", []

        self.state, history, wall = fit(
            self.state, train_step, batches_fn, self.n_epoch, seed=self.seed,
            checkpoint_path=checkpoint_path, checkpoint_freq=self.checkpoint_freq,
            validate_fn=validate, name="reconstruction AE",
            place_state=self._place_state(),
        )
        self.outputs["train"]["time"] = wall
        self.outputs["train"]["evolution"] = history

    def reconstruct(self, images: np.ndarray) -> np.ndarray:
        run = getattr(self, "_reconstruct_jit", None)
        if run is None:  # one trace per trainer (weights passed as args)
            net = self.net

            @jax.jit
            def run(v, x):
                if x.ndim == 3:
                    x = x[..., None]
                return net.apply(v, x, train=False)

            self._reconstruct_jit = run
        variables = self._variables()

        from ich_tpu.utils.pipeline import fetch_pipelined

        dev = (run(variables, jnp.asarray(images[idx]))
               for idx in batch_indices(len(images), self.batch_size, shuffle=False, pad_wrap=False))
        # image-sized outputs: small in-flight window keeps HBM O(depth)
        return np.concatenate(list(fetch_pipelined(dev, depth=4)), axis=0)[..., 0]

    def anomaly_map(self, images: np.ndarray) -> np.ndarray:
        """|im - rec| heatmaps (the AD_AE scoring, reference
        ``AD_AE_scripts.py:152-176``)."""
        return np.abs(self.reconstruct(images) - images)

    def validate(self, dataset, save_path: Optional[str] = None, epoch: int = 0) -> float:
        images = dataset.images[: min(len(dataset.images), 64)]
        rec = self.reconstruct(images)
        l1 = float(np.abs(rec - images).mean())
        self.outputs["eval"]["l1_valid"] = l1
        if save_path:
            from PIL import Image

            os.makedirs(save_path, exist_ok=True)
            for i in range(min(8, len(images))):
                row = np.concatenate([images[i], np.clip(rec[i], 0, 1)], axis=1)
                Image.fromarray((row * 255).astype(np.uint8)).save(
                    os.path.join(save_path, f"rec_ep{epoch}_{i}.png")
                )
        return l1


TRAINERS.add("AE", AE)
