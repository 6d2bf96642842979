"""Persistent XLA compilation cache for production serving.

The reference pays no compile cost (torch eager); under XLA the first
`segment_volumes` call in a fresh process traces + compiles the sliding
window program (~20-40 s on TPU). Enabling the persistent cache makes
every later process restart hit the on-disk executable instead, so
serving restarts are warm. Opt-in because the cache directory must live
on storage shared by every process that should benefit.

Usage (before the first jitted call)::

    from ich_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()          # default: ~/.cache/ich_tpu/xla

The CLI drivers call this automatically (``scripts/_common.py``); set
``ICH_TPU_NO_COMPILE_CACHE=1`` to disable.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "ich_tpu", "xla",
)


def enable_compilation_cache(
    cache_dir: Optional[str] = None,
    min_compile_time_secs: float = 0.0,  # jax's default of 1.0 would skip
    # sub-second programs — serving restarts would re-pay every one of them
) -> Optional[str]:
    """Point jax's persistent compilation cache at ``cache_dir``.

    Returns the directory in use, or None when disabled via
    ``ICH_TPU_NO_COMPILE_CACHE`` or when the jax config knobs are
    unavailable. Safe to call more than once; the first call wins
    (matching jax's own initialize-once semantics).
    """
    if os.environ.get("ICH_TPU_NO_COMPILE_CACHE"):
        return None
    cache_dir = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even fast compiles: serving restarts re-pay every program
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
        )
    except Exception as e:  # pragma: no cover - config names are stable in-tree
        logger.warning("compilation cache unavailable: %s", e)
        return None
    return cache_dir
