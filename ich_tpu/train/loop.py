"""Shared host-side epoch loop with crash-resume.

Every reference trainer repeats the same skeleton: resume-from-checkpoint
try/except, epoch loop with per-epoch log line, periodic checkpoint
(SURVEY §2.5). Here it is once, as a function over a pure jitted step —
ALL nine trainers route through this loop, so preemption, resume and
checkpoint cadence cannot drift between them.
"""

from __future__ import annotations

import logging
import time
from datetime import timedelta
from typing import Any, Callable, Iterable, Optional, Tuple

import jax
import numpy as np

from ich_tpu.train import checkpoint as ckpt
from ich_tpu.utils import preemption

logger = logging.getLogger(__name__)


def fit(
    state: Any,
    train_step: Callable,  # (state, batch, key) -> (state, loss_or_tuple)
    batches_fn: Callable[[int], Iterable],  # epoch -> iterable of batches
    n_epoch: int,
    seed: int = 0,
    checkpoint_path: Optional[str] = None,
    checkpoint_freq: int = 10,
    validate_fn: Optional[Callable[[Any, int], Tuple[str, list]]] = None,
    name: str = "model",
    epoch_hook: Optional[Callable[[Any, int, Optional[np.ndarray], float], list]] = None,
    place_state: Optional[Callable[[Any], Any]] = None,
) -> Tuple[Any, list, float]:
    """Run the training loop; returns (state, history, wall_time).

    ``train_step`` may return a scalar loss or a tuple of device scalars
    (e.g. the GAN's (g, d, l1)); per-epoch means are reduced on device and
    fetched once.

    ``epoch_hook(state, epoch, mean_losses, epoch_time) -> history_row``
    owns validation + the per-epoch log line when a trainer needs a
    non-standard format; ``mean_losses`` is a numpy scalar/vector (None if
    the epoch had no batches). Without it, the default hook logs the
    reference's standard line and builds rows from ``validate_fn(state,
    epoch) -> (log_suffix, extra_columns)`` as ``[epoch+1, mean_loss,
    *extra_columns]``.

    ``place_state`` re-places a freshly restored state (e.g. replicate over
    a mesh) — the restore template is whatever ``state`` was passed in, so
    mesh-sharded callers should device_put BEFORE calling fit and pass the
    same placement here for the msgpack (host-side) restore path.
    """
    # register the graceful-SIGTERM handler so the preemption.requested()
    # poll below can ever fire (idempotent; no-op off the main thread)
    preemption.install()
    n_epoch_finished, history = 0, []
    if checkpoint_path:
        restored = ckpt.load_checkpoint_auto(checkpoint_path, state)
        if restored is not None:
            state, n_epoch_finished, history = restored
            if place_state is not None:
                state = place_state(state)
            logger.info("Checkpoint loaded with %d epoch finished.", n_epoch_finished)
        else:
            logger.info("No Checkpoint found. Training from beginning.")

    if epoch_hook is None:
        def epoch_hook(state, epoch, mean_losses, epoch_time):  # noqa: F811
            mean_loss = float(mean_losses) if mean_losses is not None else 0.0
            suffix, extra = "", []
            if validate_fn is not None:
                suffix, extra = validate_fn(state, epoch)
            logger.info(
                "\t| Epoch: %03d/%03d | Train time: %s | Train Loss: %.6f %s|",
                epoch + 1, n_epoch,
                timedelta(seconds=int(epoch_time)), mean_loss, suffix,
            )
            return [epoch + 1, mean_loss] + list(extra)

    logger.info("Start training the %s.", name)
    root_key = jax.random.PRNGKey(seed)
    start_time = time.time()

    for epoch in range(n_epoch_finished, n_epoch):
        # keep per-step losses as DEVICE scalars: a float(loss) here would
        # block dispatch on every step (and on this image's tunneled
        # platform each fetch is a host round-trip); fetch once per epoch
        losses, epoch_start = [], time.time()
        epoch_key = jax.random.fold_in(root_key, epoch)
        for b, batch in enumerate(batches_fn(epoch)):
            # chained fold_in is collision-free for any epoch length (the
            # old epoch*K+b encoding aliased (e, K) with (e+1, 0) once an
            # epoch exceeded K steps)
            key = jax.random.fold_in(epoch_key, b)
            state, loss = train_step(state, batch, key)
            losses.append(
                jax.numpy.stack(loss) if isinstance(loss, (tuple, list)) else loss
            )
        mean_losses = (
            np.asarray(jax.numpy.stack(losses).mean(axis=0)) if losses else None
        )

        history.append(epoch_hook(state, epoch, mean_losses, time.time() - epoch_start))
        saved = False
        if checkpoint_path and (epoch + 1) % checkpoint_freq == 0:
            ckpt.save_checkpoint_auto(checkpoint_path, state, epoch + 1, history)
            logger.info("\tCheckpoint saved.")
            saved = True
        # cross-host agreement: acting on a per-host flag would let one
        # host enter the checkpoint barrier while another proceeds into
        # the next epoch's collectives (deadlock on a multi-host mesh)
        if preemption.requested_global():
            if checkpoint_path and not saved:
                ckpt.save_checkpoint_auto(checkpoint_path, state, epoch + 1, history)
            logger.warning(
                "Preemption requested: checkpointed after epoch %d, stopping.",
                epoch + 1,
            )
            break

    wall = time.time() - start_time
    logger.info("Finished training %s in %s", name, timedelta(seconds=int(wall)))
    return state, history, wall
