"""Preemption-aware training (graceful SIGTERM checkpointing).

The reference's failure story is crash-resume from the last periodic
checkpoint (SURVEY §5) — a preempted job loses up to ``checkpoint_freq``
epochs. TPU pods are routinely preempted, so the fit loop here also listens
for SIGTERM/SIGINT: when one arrives, the current epoch finishes, a
checkpoint is written, and training returns cleanly (resumable).
"""

from __future__ import annotations

import logging
import signal
import threading

logger = logging.getLogger(__name__)

_requested = threading.Event()
_installed = False


def _handler(signum, frame):
    logger.warning("Signal %s received: checkpointing at epoch boundary.", signum)
    _requested.set()


def install(signals=(signal.SIGTERM,)) -> None:
    """Install the graceful-preemption handler (main thread only)."""
    global _installed
    if _installed:
        return
    try:
        for s in signals:
            signal.signal(s, _handler)
        _installed = True
    except ValueError:  # not in main thread (e.g. under some runners)
        logger.debug("preemption handler not installed (non-main thread)")


def requested() -> bool:
    return _requested.is_set()


def reset() -> None:
    _requested.clear()
