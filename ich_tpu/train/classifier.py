"""Slice-classification trainers (pretraining + AD gating).

Reference: ``code/src/models/optim/Classifier.py`` — ``BinaryClassifier``
(ICH / no-ICH, class-weighted CE; used both as encoder pretraining and as
the slice-triage gate for the anomaly-detection pipelines) and
``MultiClassifier`` (7-way multilabel BCE over ICH subtypes,
``datasets.py:368``).

Two reference defects are deliberately FIXED here (SURVEY §2.10):
- BinaryClassifier applied softmax before CrossEntropyLoss
  (``Classifier.py:147-148``) — we feed raw logits to the CE;
- MultiClassifier passed ``sigmoid(input)`` (the image!) to the loss
  (``Classifier.py:459``) — we use the prediction logits.

Evaluation: ROC-AUC / accuracy / recall / precision / F1 (+ subset
accuracy and macro averages for multilabel), reference
``Classifier.py:260-264,573-578``.
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ich_tpu.data.core import batch_indices
from ich_tpu.ops.losses import softmax_cross_entropy, weighted_bce_with_logits
from ich_tpu.ops.metrics import classification_metrics, multilabel_metrics
from ich_tpu.train.loop import fit
from ich_tpu.train.ssl import _SSLBase
from ich_tpu.train.state import TrainState
from ich_tpu.utils.config import TRAINERS
from ich_tpu.utils import rng as rng_utils

logger = logging.getLogger(__name__)


class _ClassifierBase(_SSLBase):
    def __init__(self, net, augment_fn=None, class_weight=None, **kwargs):
        super().__init__(net, **kwargs)
        self.augment_fn = augment_fn
        self.class_weight = class_weight
        self.outputs["eval"] = {"time": None, "metrics": None}

    def _loss(self, logits, labels):
        raise NotImplementedError

    def _scores(self, logits):
        raise NotImplementedError

    def _make_train_step(self):
        net, tx, augment = self.net, self._tx, self.augment_fn
        has_bn = self.state.batch_stats is not None
        loss_of = self._loss

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, batch, key):
            images, labels = batch
            if images.ndim == 3:
                images = images[..., None]
            ak, dk = jax.random.split(key)
            if augment is not None:
                images = augment(ak, images)

            def loss_fn(params):
                variables = {"params": params}
                if has_bn:
                    variables["batch_stats"] = state.batch_stats
                out = net.apply(
                    variables, images, train=True, rngs={"dropout": rng_utils.dropout_key(dk)},
                    mutable=["batch_stats"] if has_bn else [],
                )
                logits, mut = out
                return loss_of(logits, labels), mut.get("batch_stats")

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
            return TrainState(new_params, new_stats, new_opt, state.step + 1), loss

        return step

    def train(self, dataset, valid_dataset=None, checkpoint_path: Optional[str] = None):
        """``dataset``: object with .images (N,H,W[,C]) and .labels."""
        n = len(dataset.images)
        steps_per_epoch = max(1, int(np.ceil(n / self.batch_size)))
        self._ensure_state(dataset.images.shape[1:], steps_per_epoch)
        self._dp_prepare()
        step = self._make_train_step()
        host_rng = np.random.default_rng(self.seed)
        images, labels = dataset.images, np.asarray(dataset.labels)

        def batches_fn(epoch):
            for idx in batch_indices(n, self.batch_size, shuffle=True, rng=host_rng):
                yield (self._place(jnp.asarray(images[idx])),
                       self._place(jnp.asarray(labels[idx])))

        def validate(state, epoch):
            if valid_dataset is None:
                return "", [None]
            self.state = state
            m = self.evaluate(valid_dataset, print_to_logger=False)
            return f"| Valid AUC: {m.get('auc', m.get('auc_macro', float('nan'))):.4f} ", [m]

        self.state, history, wall = fit(
            self.state, step, batches_fn, self.n_epoch, seed=self.seed,
            checkpoint_path=checkpoint_path, checkpoint_freq=self.checkpoint_freq,
            validate_fn=validate, name=type(self).__name__,
            place_state=self._place_state(),
        )
        self.outputs["train"]["time"] = wall
        self.outputs["train"]["evolution"] = history

    def predict_scores(self, images: np.ndarray) -> np.ndarray:
        """Class scores for a stack of images (used by the AD gates)."""
        variables = self._variables()
        run = getattr(self, "_predict_jit", None)
        if run is None:  # one trace per trainer
            net = self.net
            scores_of = self._scores

            @jax.jit
            def run(v, x):
                if x.ndim == 3:
                    x = x[..., None]
                return scores_of(net.apply(v, x, train=False))

            self._predict_jit = run

        from ich_tpu.utils.pipeline import fetch_pipelined

        n = len(images)
        # bounded pipeline: per-batch fetch pays a ~34 ms tunnel round-trip,
        # unbounded dispatch pins every batch in HBM — keep `depth` in flight
        dev = (run(variables, jnp.asarray(images[idx]))
               for idx in batch_indices(n, self.batch_size, shuffle=False, pad_wrap=False))
        return np.concatenate(list(fetch_pipelined(dev, depth=8)), axis=0)

    def evaluate(self, dataset, print_to_logger: bool = True, save_path: Optional[str] = None):
        start = time.time()
        self._ensure_state(dataset.images.shape[1:])
        scores = self.predict_scores(dataset.images)
        m = self._metrics(np.asarray(dataset.labels), scores)
        self.outputs["eval"]["time"] = time.time() - start
        self.outputs["eval"]["metrics"] = m
        if print_to_logger:
            logger.info("Classifier eval: %s", m)
        if save_path:
            from ich_tpu.utils.logging import save_json

            save_json(f"{save_path}/classifier_scores.json", m)
        return m


class BinaryClassifier(_ClassifierBase):
    """2-way slice classifier; class-weighted CE on logits."""

    def _loss(self, logits, labels):
        w = jnp.asarray(self.class_weight) if self.class_weight is not None else None
        return softmax_cross_entropy(logits, labels, class_weights=w)

    def _scores(self, logits):
        return jax.nn.softmax(logits, axis=-1)[:, 1]

    def _metrics(self, labels, scores):
        return classification_metrics(labels, scores)


class MultiClassifier(_ClassifierBase):
    """Multilabel (7-way: ICH subtypes + any + fracture/other schema of the
    RSNA csv) classifier; BCE-with-logits, optional positive-class weight."""

    def _loss(self, logits, labels):
        pw = float(self.class_weight) if self.class_weight is not None else 1.0
        return weighted_bce_with_logits(logits, labels, pos_weight=pw)

    def _scores(self, logits):
        return jax.nn.sigmoid(logits)

    def _metrics(self, labels, scores):
        return multilabel_metrics(labels, scores)


TRAINERS.add("BinaryClassifier", BinaryClassifier)
TRAINERS.add("MultiClassifier", MultiClassifier)
