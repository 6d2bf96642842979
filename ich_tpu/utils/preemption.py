"""Preemption-aware training (graceful SIGTERM checkpointing).

The reference's failure story is crash-resume from the last periodic
checkpoint (SURVEY §5) — a preempted job loses up to ``checkpoint_freq``
epochs. TPU pods are routinely preempted, so the fit loop listens for
SIGTERM (``install()`` is called by :func:`ich_tpu.train.loop.fit`): when
one arrives, the current epoch finishes, a checkpoint is written, and
training returns cleanly (resumable). SIGINT is NOT intercepted by default
— an interactive Ctrl-C should raise KeyboardInterrupt immediately; pass
``install(signals=(SIGTERM, SIGINT))`` to opt in.

The flag stays set after ``fit`` returns (deliberately: a preempted
process is about to be killed, and later ``fit`` calls in the same process
must not silently train for one epoch each and report success) — drivers
check :func:`requested` after training and abort their pipeline;
:func:`reset` re-arms for tests/long-lived servers.
"""

from __future__ import annotations

import logging
import signal
import threading

logger = logging.getLogger(__name__)

_requested = threading.Event()
_installed: set = set()


def _handler(signum, frame):
    logger.warning("Signal %s received: checkpointing at epoch boundary.", signum)
    _requested.set()


def install(signals=(signal.SIGTERM,)) -> None:
    """Install the graceful-preemption handler (main thread only).
    Idempotent per signal; later calls may ADD signals."""
    for s in signals:
        if s in _installed:
            continue
        try:
            signal.signal(s, _handler)
            _installed.add(s)
        except ValueError:  # not in main thread (e.g. under some runners)
            logger.debug("preemption handler not installed (non-main thread)")
            return


def requested() -> bool:
    return _requested.is_set()


def requested_global() -> bool:
    """The preemption flag agreed across hosts: on a multi-process mesh a
    SIGTERM lands on one host; every host must take the checkpoint/stop
    branch at the SAME epoch boundary or the ones that proceed into the
    next epoch's collectives deadlock against the checkpoint barrier."""
    import jax

    if jax.process_count() == 1:
        return _requested.is_set()
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        jax.numpy.asarray(int(_requested.is_set()))
    )
    return bool(int(flags.max()) > 0)


def reset() -> None:
    _requested.clear()
