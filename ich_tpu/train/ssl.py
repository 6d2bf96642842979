"""Self-supervised pretraining trainers: context restoration + contrastive.

TPU redesign of the reference's ``ContextRestoration`` (MSE reconstruction
of a patch-swap-corrupted input, ``code/src/models/optim/
ContextRestoration.py``) and ``Contrastive`` (global SimCLR-style NT-Xent on
a U-Net encoder / local Chaitanya-2020 NT-Xent on partial-decoder feature
maps, ``code/src/models/optim/Contrastive.py``).

Key TPU differences:
- the corruption / two augmented views are generated ON DEVICE inside the
  jitted train step (the reference computes them in CPU DataLoader workers);
- under a data-parallel mesh, NT-Xent negatives can span the global batch
  via all_gather (``info_nce_loss(axis_name=...)``) — the reference's
  negative set is whatever fits one GPU;
- ``transfer_weights(..., freeze=...)`` freezes via an optax mask instead
  of ``requires_grad`` mutation (reference ``Contrastive.py:227-253``).

Evaluation (representation quality) matches the reference: bottleneck
features, 4x4 average-pooled, embedded to 2D with t-SNE and stored in
``outputs`` for the analysis PDFs (``ContextRestoration.py:196-220``).
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ich_tpu.data.core import batch_indices
from ich_tpu.ops import transforms as T
from ich_tpu.ops.losses import info_nce_loss, local_info_nce_loss, mse_loss
from ich_tpu.train import checkpoint as ckpt
from ich_tpu.train.loop import fit
from ich_tpu.train.state import TrainState, create_train_state, make_optimizer, make_schedule
from ich_tpu.utils.config import TRAINERS
from ich_tpu.utils.logging import save_json
from ich_tpu.utils import rng as rng_utils

logger = logging.getLogger(__name__)


class _SSLBase:
    """Shared state management / IO for the SSL trainers."""

    def __init__(
        self,
        net,
        n_epoch: int = 100,
        batch_size: int = 32,
        lr: float = 1e-3,
        lr_scheduler: str = "ExponentialLR",
        lr_scheduler_kwargs: Optional[dict] = None,
        weight_decay: float = 1e-6,
        seed: int = 0,
        checkpoint_freq: int = 1,
        mesh=None,  # jax.sharding.Mesh for data-parallel training
        num_workers: int = 0,  # config parity; unused
        device: Optional[str] = None,  # config parity; unused
        print_progress: bool = False,
    ):
        self.net = net
        self.n_epoch = n_epoch
        self.batch_size = batch_size
        self.lr = lr
        self.lr_scheduler = lr_scheduler
        self.lr_scheduler_kwargs = dict(lr_scheduler_kwargs or {"gamma": 0.95})
        self.weight_decay = weight_decay
        self.seed = seed
        self.checkpoint_freq = checkpoint_freq
        self.mesh = mesh
        self.print_progress = print_progress

        self.state: Optional[TrainState] = None
        self._tx = None
        self._tx_steps: Optional[int] = None  # steps_per_epoch the tx was built with
        self._pending_transfer = None
        self._trainable_mask = None  # optax freeze mask (True = train)
        self.outputs = {
            "train": {"time": None, "evolution": None},
            "eval": {"time": None, "repr": None},
        }

    def _example_input(self, image_shape) -> jnp.ndarray:
        shape = (1,) + tuple(image_shape)
        if len(image_shape) == 2:
            shape = shape + (1,)
        return jnp.zeros(shape, jnp.float32)

    def _ensure_state(self, image_shape, steps_per_epoch: Optional[int] = None) -> None:
        """``steps_per_epoch=None`` means this call doesn't care about the
        schedule cadence (eval/IO paths); ``train()`` passes the real value,
        rebuilding the optimizer if an earlier don't-care call pinned a
        different one — per-epoch torch schedules (ExponentialLR etc.) must
        decay per EPOCH, not per step."""
        if self._tx is None:
            self._tx_steps = steps_per_epoch
            self._tx = self._build_tx(steps_per_epoch or 1)
        elif steps_per_epoch is not None and steps_per_epoch != self._tx_steps:
            self._tx_steps = steps_per_epoch
            self._tx = self._build_tx(steps_per_epoch)
            if self.state is not None:
                self.state = self.state.replace(opt_state=self._tx.init(self.state.params))
        if self.state is None:
            self.state = create_train_state(
                self.net, jax.random.PRNGKey(self.seed),
                self._example_input(image_shape), self._tx,
            )
            if getattr(self, "_pending_transfer", None) is not None:
                src, freeze, verbose = self._pending_transfer
                self._pending_transfer = None
                self.transfer_weights(src, freeze=freeze, verbose=verbose)

    def _build_tx(self, steps_per_epoch: int):
        import optax

        schedule = make_schedule(
            self.lr_scheduler, self.lr, steps_per_epoch, **self.lr_scheduler_kwargs
        )
        tx = make_optimizer(schedule, weight_decay=self.weight_decay)
        if self._trainable_mask is not None:
            # frozen leaves get a hard zero update (optax.masked would pass
            # the raw gradient through untouched instead)
            labels = jax.tree_util.tree_map(
                lambda trainable: "train" if trainable else "freeze",
                self._trainable_mask,
            )
            tx = optax.multi_transform(
                {"train": tx, "freeze": optax.set_to_zero()}, labels
            )
        return tx

    def _variables(self) -> dict:
        return self.state.variables()

    def _dp_prepare(self) -> None:
        """Data-parallel layout: state replicated over the mesh (call once
        before training when ``mesh`` is set)."""
        if self.mesh is not None:
            from ich_tpu.parallel.mesh import replicated_sharding

            self.state = jax.device_put(self.state, replicated_sharding(self.mesh))

    def _place_state(self):
        """``place_state`` hook for :func:`ich_tpu.train.loop.fit`: re-places
        a state restored from the msgpack (host-side) store back onto the
        mesh. None without a mesh."""
        if self.mesh is None:
            return None
        from ich_tpu.parallel.mesh import replicated_sharding

        return lambda s: jax.device_put(s, replicated_sharding(self.mesh))

    def _place(self, x):
        """Shard a batched array over the mesh's data axis (no-op without
        a mesh)."""
        if self.mesh is None:
            return x
        from ich_tpu.parallel.mesh import batch_sharding

        return jax.device_put(x, batch_sharding(self.mesh, jnp.ndim(x)))

    def transfer_weights(self, source_variables: dict, freeze: bool = False, verbose: bool = False):
        """Key-intersection transfer; optionally freeze the transferred
        parameters (reference ``Contrastive.py:227-253``). Must be called
        before training starts for the freeze to take effect."""
        if self.state is None:
            # defer until state exists; record intent
            self._pending_transfer = (source_variables, freeze, verbose)
            return []
        src = source_variables.get("params", source_variables)
        new_params, moved = ckpt.transfer_weights(self.state.params, src, verbose)
        new_stats = self.state.batch_stats
        if "batch_stats" in source_variables and new_stats is not None:
            new_stats, _ = ckpt.transfer_weights(
                new_stats, source_variables["batch_stats"], verbose
            )
        self.state = self.state.replace(params=new_params, batch_stats=new_stats)
        if freeze and moved:
            self._trainable_mask = ckpt.freeze_mask(self.state.params, moved)
            if self._tx is not None:
                # rebuild at the REAL schedule cadence (ADVICE r1: rebuilding
                # with steps_per_epoch=1 made per-epoch schedules decay per step)
                self._tx = self._build_tx(self._tx_steps or 1)
                self.state = self.state.replace(opt_state=self._tx.init(self.state.params))
        return moved

    def get_state_dict(self) -> dict:
        return jax.tree_util.tree_map(np.asarray, self._variables())

    def save_model(self, export_fn: str) -> None:
        ckpt.save_params(export_fn, self._variables())

    def load_model(self, import_fn: str, image_shape=(256, 256)) -> None:
        if self.state is None:
            self._ensure_state(image_shape)
        loaded = ckpt.load_params(import_fn, self._variables())
        self.state = self.state.replace(
            params=loaded["params"], batch_stats=loaded.get("batch_stats")
        )

    def save_outputs(self, export_fn: str) -> None:
        save_json(export_fn, self.outputs)

    # -- representation eval (t-SNE of bottleneck) --------------------------

    def _bottleneck_fn(self) -> Callable:
        net = self.net

        @jax.jit
        def run(variables, images):
            if images.ndim == 3:
                images = images[..., None]
            _, bott = net.apply(variables, images, train=False, return_bottleneck=True)
            if bott.ndim == 4:  # (B, h, w, C): average-pool to 4x4 like the
                # reference's AdaptiveAvgPool2d((4,4)) (ContextRestoration.py)
                b, h, w, c = bott.shape
                fh, fw = max(1, h // 4), max(1, w // 4)
                bott = bott[:, : (h // fh) * fh, : (w // fw) * fw, :]
                bott = bott.reshape(b, h // fh, fh, w // fw, fw, c).mean(axis=(2, 4))
            return bott.reshape(bott.shape[0], -1)

        return run

    def evaluate_representation(
        self, dataset, labels: Optional[np.ndarray] = None, max_samples: int = 2000
    ):
        """Bottleneck features → t-SNE 2D; stored in outputs['eval']['repr']
        as [[x, y, label...], ...] (reference ``ContextRestoration.py:196-220``)."""
        from sklearn.manifold import TSNE

        start = time.time()
        self._ensure_state(dataset.image_shape)
        run = self._bottleneck_fn()
        variables = self._variables()
        n = min(len(dataset), max_samples)
        from ich_tpu.utils.pipeline import fetch_pipelined

        dev = (run(variables, jnp.asarray(dataset.images[idx]))
               for idx in batch_indices(n, self.batch_size, shuffle=False, pad_wrap=False))
        feats = np.concatenate(list(fetch_pipelined(dev, depth=8)), axis=0)[:n]
        emb = TSNE(n_components=2, init="pca", random_state=self.seed).fit_transform(feats)
        if labels is not None:
            payload = np.concatenate(
                [emb, np.asarray(labels)[:n].reshape(n, -1)], axis=1
            )
        else:
            payload = emb
        self.outputs["eval"]["time"] = time.time() - start
        self.outputs["eval"]["repr"] = payload.tolist()
        return emb

    evaluate = evaluate_representation


class ContextRestoration(_SSLBase):
    """Patch-swap context restoration (Chen 2019; reference
    ``ContextRestoration.py``). ``net`` is a U-Net with no final activation;
    the corruption runs on device in the train step."""

    def __init__(
        self, net,
        n_swap: int = 10,
        swap_w=(10, 30),
        swap_h=(10, 30),
        swap_rotate: bool = True,
        **kwargs,
    ):
        super().__init__(net, **kwargs)
        self.corrupt = T.RandomPatchSwap(
            n=n_swap, w=swap_w, h=swap_h, rotate=swap_rotate
        )

    def _make_train_step(self):
        net, corrupt, tx = self.net, self.corrupt, self._tx
        has_bn = self.state.batch_stats is not None

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, images, key):
            if images.ndim == 3:
                images = images[..., None]
            ck, dk = jax.random.split(key)
            corrupted = corrupt(ck, images)

            def loss_fn(params):
                variables = {"params": params}
                if has_bn:
                    variables["batch_stats"] = state.batch_stats
                out = net.apply(
                    variables, corrupted, train=True, rngs={"dropout": rng_utils.dropout_key(dk)},
                    mutable=["batch_stats"] if has_bn else [],
                )
                recon, mut = out
                return mse_loss(recon, images), mut.get("batch_stats")

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
            return TrainState(new_params, new_stats, new_opt, state.step + 1), loss

        return step

    def train(self, dataset, valid_dataset=None, checkpoint_path: Optional[str] = None):
        n = len(dataset)
        steps_per_epoch = max(1, n // self.batch_size)
        self._ensure_state(dataset.image_shape, steps_per_epoch)
        self._dp_prepare()
        step = self._make_train_step()
        host_rng = np.random.default_rng(self.seed)
        images = dataset.images

        def batches_fn(epoch):
            for idx in batch_indices(n, self.batch_size, shuffle=True, rng=host_rng, drop_last=True):
                b = jnp.asarray(images[idx]) if not isinstance(images, jax.Array) else jnp.take(images, jnp.asarray(idx), axis=0)
                yield self._place(b)

        self.state, history, wall = fit(
            self.state, lambda s, b, k: step(s, b, k), batches_fn,
            self.n_epoch, seed=self.seed, checkpoint_path=checkpoint_path,
            checkpoint_freq=self.checkpoint_freq, name="context-restoration U-Net",
            place_state=self._place_state(),
        )
        self.outputs["train"]["time"] = wall
        self.outputs["train"]["evolution"] = history


class Contrastive(_SSLBase):
    """Global (encoder NT-Xent) or local (partial-decoder region NT-Xent)
    contrastive pretraining (reference ``Contrastive.py``).

    ``aug_pipeline``: a :class:`ich_tpu.ops.transforms.Compose` generating a
    view from a batch (applied twice with independent keys).
    ``axis_name``: set when running inside shard_map/pmap to gather
    negatives across devices (global mode).
    """

    def __init__(
        self, net,
        is_global: bool = True,
        tau: float = 0.5,
        n_region: int = 13,
        K: int = 3,
        aug_pipeline: Optional[T.Compose] = None,
        axis_name: Optional[str] = None,
        **kwargs,
    ):
        super().__init__(net, **kwargs)
        self.is_global = is_global
        self.tau = tau
        self.n_region = n_region
        self.K = K
        self.axis_name = axis_name
        self.aug = aug_pipeline or T.Compose(
            T.RandomCropResize((0.4, 0.8)), T.HFlip(0.5),
            T.GaussianBlur(0.5, (0.1, 2.0)),
            T.AdjustBrightness(0.5, -0.2, 0.2), T.AdjustContrast(0.5, 0.8, 1.2),
        )

    def _make_train_step(self):
        net, aug, tx = self.net, self.aug, self._tx
        is_global, tau = self.is_global, self.tau
        n_region, K, axis_name = self.n_region, self.K, self.axis_name
        has_bn = self.state.batch_stats is not None

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, images, key):
            if images.ndim == 3:
                images = images[..., None]
            # independent dropout per view (the reference's two forward
            # passes draw independent dropout masks; reusing one key would
            # correlate the views and weaken the NT-Xent objective)
            k1, k2, kd1, kd2, kr = jax.random.split(key, 5)
            v1 = aug(k1, images)
            v2 = aug(k2, images)

            def loss_fn(params):
                variables = {"params": params}
                if has_bn:
                    variables["batch_stats"] = state.batch_stats
                mut_arg = ["batch_stats"] if has_bn else []
                o1, m1 = net.apply(variables, v1, train=True, rngs={"dropout": rng_utils.dropout_key(kd1)}, mutable=mut_arg)
                if has_bn:
                    variables = {"params": params, "batch_stats": m1["batch_stats"]}
                o2, m2 = net.apply(variables, v2, train=True, rngs={"dropout": rng_utils.dropout_key(kd2)}, mutable=mut_arg)
                if is_global:
                    # L2-normalize embeddings (reference Contrastive.py:142-144)
                    z1 = o1 / jnp.maximum(jnp.linalg.norm(o1, axis=1, keepdims=True), 1e-8)
                    z2 = o2 / jnp.maximum(jnp.linalg.norm(o2, axis=1, keepdims=True), 1e-8)
                    loss = info_nce_loss(z1, z2, tau=tau, axis_name=axis_name)
                else:
                    loss = local_info_nce_loss(o1, o2, kr, tau=tau, K=K, n_region=n_region)
                return loss, (m2 if has_bn else {}).get("batch_stats")

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
            return TrainState(new_params, new_stats, new_opt, state.step + 1), loss

        return step

    def train(self, dataset, valid_dataset=None, checkpoint_path: Optional[str] = None):
        n = len(dataset)
        steps_per_epoch = max(1, n // self.batch_size)  # drop_last=True
        self._ensure_state(dataset.image_shape, steps_per_epoch)
        self._dp_prepare()
        step = self._make_train_step()
        host_rng = np.random.default_rng(self.seed)
        images = dataset.images

        def batches_fn(epoch):
            for idx in batch_indices(n, self.batch_size, shuffle=True, rng=host_rng, drop_last=True):
                b = jnp.asarray(images[idx]) if not isinstance(images, jax.Array) else jnp.take(images, jnp.asarray(idx), axis=0)
                yield self._place(b)

        name = "global contrastive encoder" if self.is_global else "local contrastive partial U-Net"
        self.state, history, wall = fit(
            self.state, lambda s, b, k: step(s, b, k), batches_fn,
            self.n_epoch, seed=self.seed, checkpoint_path=checkpoint_path,
            checkpoint_freq=self.checkpoint_freq, name=name,
            place_state=self._place_state(),
        )
        self.outputs["train"]["time"] = wall
        self.outputs["train"]["evolution"] = history


TRAINERS.add("ContextRestoration", ContextRestoration)
TRAINERS.add("Contrastive", Contrastive)
