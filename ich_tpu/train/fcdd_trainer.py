"""FCDD anomaly-localization trainer.

Reference ``code/src/models/optim/FCDD.py``: HSC-loss training on normal
slices plus anomalies (synthetic ellipses or real labeled positives),
validation AUC on the per-slice anomaly score ``mean(sqrt(f^2+1)-1)``
(``:172``), receptive-field Gaussian heatmaps (``generate_heatmap:242-253``),
dataset-level quantile min/max scaling (``get_min_max:185-209``), and
side-by-side anomaly-localization dumps (``localize_anomalies:211-240``).

TPU adaptation: the synthetic-ellipse corruption (reference FCDD dataset,
``datasets.py:603-719``) is drawn ON DEVICE inside the jitted train step —
negative slices get random bright ellipses with probability
``anomaly_proba`` and flip to label 1.
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ich_tpu.data.core import batch_indices
from ich_tpu.models.fcdd import FCDD_CNN_VGG
from ich_tpu.ops.losses import hsc_loss
from ich_tpu.ops.masks import draw_ellipses_batch
from ich_tpu.ops.metrics import classification_metrics
from ich_tpu.train.loop import fit
from ich_tpu.train.ssl import _SSLBase
from ich_tpu.train.state import TrainState
from ich_tpu.utils.config import TRAINERS

logger = logging.getLogger(__name__)


class FCDD(_SSLBase):
    def __init__(
        self,
        net,
        artificial_anomaly: bool = True,
        anomaly_proba: float = 0.5,
        drawing_params: Optional[dict] = None,
        gauss_std: Optional[float] = None,
        **kwargs,
    ):
        super().__init__(net, **kwargs)
        self.artificial_anomaly = artificial_anomaly
        self.anomaly_proba = anomaly_proba
        self.drawing_params = dict(drawing_params or {})
        self.gauss_std = gauss_std
        self.min_max: Optional[Tuple[float, float]] = None
        self.outputs["eval"] = {"time": None, "auc": None}

    def _make_train_step(self):
        net, tx = self.net, self._tx
        has_bn = self.state.batch_stats is not None
        proba, params, artificial = self.anomaly_proba, self.drawing_params, self.artificial_anomaly

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, images, labels, key):
            if images.ndim == 3:
                images = images[..., None]
            b, h, w = images.shape[:3]
            if artificial:
                ka, kp = jax.random.split(key)
                ell = draw_ellipses_batch(ka, b, (h, w), **params)[..., None]
                corrupt = (jax.random.uniform(kp, (b,)) < proba) & (labels == 0)
                images = jnp.where(
                    corrupt[:, None, None, None] & (ell > 0), ell, images
                )
                labels = jnp.where(corrupt, 1, labels)

            def loss_fn(p):
                variables = {"params": p}
                if has_bn:
                    variables["batch_stats"] = state.batch_stats
                out = net.apply(
                    variables, images, train=True,
                    mutable=["batch_stats"] if has_bn else [],
                )
                scores, mut = out
                return hsc_loss(scores, labels), mut.get("batch_stats")

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
            return TrainState(new_params, new_stats, new_opt, state.step + 1), loss

        return step

    def train(self, dataset, valid_dataset=None, checkpoint_path: Optional[str] = None):
        """``dataset``: LabeledSliceDataset (labels: 0 normal / 1 anomaly —
        use labels[:,0] of the RSNA multilabel schema)."""
        n = len(dataset.images)
        labels = np.asarray(dataset.labels)
        if labels.ndim > 1:
            labels = labels[:, 0]
        steps_per_epoch = max(1, n // self.batch_size)
        self._ensure_state(dataset.images.shape[1:], steps_per_epoch)
        self._dp_prepare()
        step = self._make_train_step()
        host_rng = np.random.default_rng(self.seed)
        images = dataset.images

        def batches_fn(epoch):
            for idx in batch_indices(n, self.batch_size, shuffle=True, rng=host_rng, drop_last=True):
                yield (self._place(jnp.asarray(images[idx])),
                       self._place(jnp.asarray(labels[idx].astype(np.int32))))

        def validate(state, epoch):
            if valid_dataset is None:
                return "", []
            self.state = state
            auc = self.validate(valid_dataset)
            return f"| Valid AUC: {auc:.4f} ", [auc]

        self.state, history, wall = fit(
            self.state, lambda s, b, k: step(s, b[0], b[1], k), batches_fn,
            self.n_epoch, seed=self.seed, checkpoint_path=checkpoint_path,
            checkpoint_freq=self.checkpoint_freq, validate_fn=validate, name="FCDD",
            place_state=self._place_state(),
        )
        self.outputs["train"]["time"] = wall
        self.outputs["train"]["evolution"] = history

    # -- scoring / heatmaps ----------------------------------------------------

    def _score_fn(self):
        """Per-call wrapper over a once-traced scoring program (weights as
        arguments, memoized on the trainer)."""
        base = getattr(self, "_score_jit", None)
        if base is None:
            net = self.net

            @jax.jit
            def base(v, x):
                if x.ndim == 3:
                    x = x[..., None]
                s = net.apply(v, x, train=False)
                a = jnp.sqrt(s.astype(jnp.float32) ** 2 + 1.0) - 1.0
                return s, jnp.mean(a.reshape(a.shape[0], -1), axis=1)

            self._score_jit = base
        variables = self._variables()
        return lambda x: base(variables, x)

    def anomaly_scores(self, images: np.ndarray) -> np.ndarray:
        """Per-slice anomaly score sum(sqrt(f^2+1)-1) (reference ``:172``)."""
        run = self._score_fn()
        from ich_tpu.utils.pipeline import fetch_pipelined

        dev = (run(jnp.asarray(images[idx]))[1]
               for idx in batch_indices(len(images), self.batch_size, shuffle=False, pad_wrap=False))
        return np.concatenate(list(fetch_pipelined(dev, depth=8)))

    def generate_heatmap(self, images: np.ndarray, scale: bool = True) -> np.ndarray:
        """Receptive-field Gaussian heatmaps at input resolution; optionally
        min/max-scaled with the dataset quantiles (reference
        ``generate_heatmap:242-253``)."""
        variables = self._variables()
        hw = images.shape[1:3]
        cache = getattr(self, "_heatmap_jit", None)
        if cache is None:
            cache = self._heatmap_jit = {}
        run = cache.get(hw)
        if run is None:  # one trace per output size (weights as args)
            net = self.net
            std = self.gauss_std

            @jax.jit
            def run(v, x):
                if x.ndim == 3:
                    x = x[..., None]
                s = net.apply(v, x, train=False)
                return FCDD_CNN_VGG.heatmap(s, hw, std=std)

            cache[hw] = run

        from ich_tpu.utils.pipeline import fetch_pipelined

        dev = (run(variables, jnp.asarray(images[idx]))
               for idx in batch_indices(len(images), self.batch_size, shuffle=False, pad_wrap=False))
        heat = np.concatenate(list(fetch_pipelined(dev, depth=4)))[..., 0]
        if scale and self.min_max is not None:
            lo, hi = self.min_max
            heat = np.clip((heat - lo) / max(hi - lo, 1e-8), 0.0, 1.0)
        return heat

    def grad_heatmap(self, images: np.ndarray, method: str = "grad",
                     absolute: bool = True) -> np.ndarray:
        """Gradient-based heatmap alternative: d(per-sample HSC pseudo-Huber
        loss)/d(input), optionally input-weighted ('xgrad'), |.|, summed
        over channels (reference ``FCDD_BaseNet.get_grad_heatmap:192-214``
        — dead code there, parity-closed here as one ``jax.grad``)."""
        assert method in ("grad", "xgrad")
        net = self.net
        variables = self._variables()

        @jax.jit
        def run(x):
            if x.ndim == 3:
                x = x[..., None]

            def loss_sum(xi):
                s = net.apply(variables, xi, train=False)
                a = jnp.sqrt(s.astype(jnp.float32) ** 2 + 1.0) - 1.0
                # sum of per-sample mean losses: grad rows are per-sample
                return jnp.sum(jnp.mean(a.reshape(a.shape[0], -1), axis=1))

            g = jax.grad(loss_sum)(x)
            heat = x * g if method == "xgrad" else g
            if absolute:
                heat = jnp.abs(heat)
            return jnp.sum(heat, axis=-1)

        from ich_tpu.utils.pipeline import fetch_pipelined

        dev = (run(jnp.asarray(images[idx]))
               for idx in batch_indices(len(images), self.batch_size, shuffle=False, pad_wrap=False))
        return np.concatenate(list(fetch_pipelined(dev, depth=4)))

    def get_min_max(self, images: np.ndarray, quantiles=(0.025, 0.975)) -> Tuple[float, float]:
        """Dataset-level heatmap quantile range for display scaling
        (reference ``get_min_max:185-209``)."""
        heat = self.generate_heatmap(images, scale=False)
        lo, hi = np.quantile(heat, quantiles[0]), np.quantile(heat, quantiles[1])
        self.min_max = (float(lo), float(hi))
        return self.min_max

    def validate(self, dataset) -> float:
        labels = np.asarray(dataset.labels)
        if labels.ndim > 1:
            labels = labels[:, 0]
        scores = self.anomaly_scores(dataset.images)
        m = classification_metrics(labels, scores)
        self.outputs["eval"]["auc"] = m["auc"]
        return m["auc"]

    def localize_anomalies(self, images: np.ndarray, save_path: str, n: int = 8) -> None:
        """Save [image | heatmap] side-by-side pngs (reference
        ``localize_anomalies:211-240``)."""
        from PIL import Image

        os.makedirs(save_path, exist_ok=True)
        heat = self.generate_heatmap(images[:n])
        if self.min_max is None:
            heat = (heat - heat.min()) / max(heat.max() - heat.min(), 1e-8)
        for i in range(min(n, len(images))):
            row = np.concatenate([images[i], heat[i]], axis=1)
            Image.fromarray((np.clip(row, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(save_path, f"anomaly_{i}.png")
            )


TRAINERS.add("FCDD", FCDD)
