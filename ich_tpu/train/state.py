"""Functional training state + optimizer construction.

The reference couples optimization into each trainer class (Adam +
torch lr_scheduler built inside ``train()``, e.g. ``UNet2D.py:101-106``).
Here the state is one pytree (params, batch_stats, opt_state, step) threaded
through a pure jitted ``train_step`` — the trainer classes in this package
are thin host loops over it.

Optimizer semantics match torch's ``Adam(lr, weight_decay)`` (L2 folded into
the gradient *before* the Adam moments — not AdamW) and the torch
lr_schedulers stepped per epoch (schedules are functions of the step index
with ``steps_per_epoch`` baked in). Schedules are exposed through the
``SCHEDULES`` registry under the torch names used by the reference configs
(``getattr(torch.optim.lr_scheduler, ...)`` at ``UNet2D_scripts.py:154``).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import flax.struct
import jax
import optax

from ich_tpu.utils.config import SCHEDULES


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array  # int32 scalar

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


# -- lr schedules (per-epoch stepping like torch, expressed per-step) -------

@SCHEDULES.register("ExponentialLR")
def exponential_lr(lr: float, steps_per_epoch: int, gamma: float = 0.95) -> Callable:
    def schedule(step):
        epoch = step // steps_per_epoch
        return lr * gamma**epoch

    return schedule


@SCHEDULES.register("StepLR")
def step_lr(lr: float, steps_per_epoch: int, step_size: int = 30, gamma: float = 0.1) -> Callable:
    def schedule(step):
        epoch = step // steps_per_epoch
        return lr * gamma ** (epoch // step_size)

    return schedule


@SCHEDULES.register("CosineAnnealingLR")
def cosine_lr(lr: float, steps_per_epoch: int, T_max: int = 50, eta_min: float = 0.0) -> Callable:
    def schedule(step):
        epoch = step // steps_per_epoch
        return eta_min + 0.5 * (lr - eta_min) * (1 + jax.numpy.cos(math.pi * epoch / T_max))

    return schedule


@SCHEDULES.register("ConstantLR")
def constant_lr(lr: float, steps_per_epoch: int) -> Callable:
    return lambda step: lr


@SCHEDULES.register("MultiStepLR")
def multistep_lr(lr: float, steps_per_epoch: int, milestones=(30, 80), gamma: float = 0.1) -> Callable:
    ms = tuple(sorted(milestones))

    def schedule(step):
        epoch = step // steps_per_epoch
        n = sum(jax.numpy.asarray(epoch >= m, dtype=jax.numpy.int32) for m in ms)
        return lr * gamma**n

    return schedule


def make_schedule(
    name: str, lr: float, steps_per_epoch: int, **kwargs: Any
) -> Callable:
    return SCHEDULES.build(name, lr=lr, steps_per_epoch=steps_per_epoch, **kwargs)


def make_optimizer(
    schedule: Callable | float,
    weight_decay: float = 0.0,
    betas: tuple = (0.9, 0.999),
    eps: float = 1e-8,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """torch-``Adam``-semantics optimizer: L2 (weight_decay) added to the
    gradient before the moment estimates (reference ``UNet2D.py:103``),
    then Adam scaling, then the lr schedule."""
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)


def create_train_state(
    model,
    rng: jax.Array,
    example_input: jax.Array,
    tx: optax.GradientTransformation,
    train_kwargs: Optional[dict] = None,
) -> TrainState:
    """Initialize model variables + optimizer state."""
    variables = model.init({"params": rng, "dropout": rng}, example_input, **(train_kwargs or {}))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", None)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jax.numpy.zeros((), dtype=jax.numpy.int32),
    )
