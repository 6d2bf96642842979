"""Orbax-backed sharded checkpointing — the multi-host production path.

The default store (:mod:`ich_tpu.train.checkpoint`) serializes the whole
state pytree into one msgpack file: correct and simple on one host, but on
a multi-host mesh it would gather every shard to host 0 and write GBs
through one process. This backend delegates to orbax's
``StandardCheckpointer``: each host writes only its own array shards, reads
restore with the target sharding (no host gather), and directory creation
is atomic via orbax's finalize step.

Same logical contents as the reference's checkpoint dict
(``UNet2D.py:169-176``): the state pytree + ``{epoch, history}`` metadata
(JSON sidecar). Restore mirrors ``load_checkpoint``: missing directory →
``None`` (fresh start).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Optional, Tuple

import jax

logger = logging.getLogger(__name__)

_META = "meta.json"
_STATE = "state"


_CKPTR = None


def _checkpointer():
    # one long-lived checkpointer: each StandardCheckpointer owns an async
    # background thread + multihost-sync resources that are never closed,
    # so constructing one per save would leak a thread per checkpoint
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def _barrier():
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("ich_tpu_ckpt_swap")


def save_checkpoint_sharded(path: str, state: Any, epoch: int, history: list) -> None:
    """Write ``state`` under ``path/state`` (sharded, each host its own
    shards) + ``path/meta.json``. ``path`` is a directory.

    Crash-safe ordering: the new checkpoint is fully written to
    ``state.new`` BEFORE the previous ``state`` is replaced, so a crash at
    any point leaves at least one complete checkpoint on disk (the loader
    falls back to ``state.new`` when ``state`` is missing). The destructive
    swap runs on process 0 only, after a cross-host barrier — every host's
    shards are finalized before anything is deleted."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = _checkpointer()
    state_dir = os.path.join(path, _STATE)
    new_dir = state_dir + ".new"
    meta_new = os.path.join(path, _META + ".new")
    if os.path.exists(new_dir) and jax.process_index() == 0:
        import shutil

        if not os.path.exists(state_dir):
            # crash landed between rmtree(state) and the swap: state.new is
            # the ONLY complete checkpoint — promote it (and its meta)
            # instead of deleting (otherwise a crash during this save
            # would lose everything)
            os.replace(new_dir, state_dir)
            if os.path.exists(meta_new):
                os.replace(meta_new, os.path.join(path, _META))
        else:
            shutil.rmtree(new_dir)  # leftover from an interrupted save
            if os.path.exists(meta_new):
                os.remove(meta_new)  # its meta is stale with state.new gone
    _barrier()
    ckptr.save(new_dir, state)
    ckptr.wait_until_finished()
    _barrier()  # all hosts' shards finalized before the swap
    if jax.process_index() == 0:
        import shutil

        # meta for the NEW state is durable BEFORE any swap: whichever
        # state dir a crash leaves behind, the loader can pair it with a
        # matching epoch (state.new <-> meta.json.new; promoted state <->
        # meta.json.new until the final rename) — resume never replays
        # more than the current save interval
        with open(meta_new + ".tmp", "w") as f:
            json.dump({"epoch": int(epoch), "history": history}, f)
        os.replace(meta_new + ".tmp", meta_new)
        if os.path.exists(state_dir):
            shutil.rmtree(state_dir)
        os.replace(new_dir, state_dir)
        os.replace(meta_new, os.path.join(path, _META))
    _barrier()


def load_checkpoint_sharded(
    path: str, state_template: Any
) -> Optional[Tuple[Any, int, list]]:
    """Restore (state, epoch, history) or ``None`` when absent. Arrays come
    back with ``state_template``'s shardings (restore is shard-local on a
    mesh — no host gather)."""
    path = os.path.abspath(path)
    state_dir = os.path.join(path, _STATE)
    meta_fn = os.path.join(path, _META)
    if not os.path.isdir(state_dir) and os.path.isdir(state_dir + ".new"):
        # crash between finalize and swap: the new checkpoint is complete
        state_dir = state_dir + ".new"
    if os.path.exists(meta_fn + ".new"):
        # a crash before the final meta rename leaves meta.json.new, which
        # describes whichever state dir survived (it is written before any
        # swap) — prefer it so the resumed epoch matches the state
        meta_fn = meta_fn + ".new"
    if not (os.path.isdir(state_dir) and os.path.exists(meta_fn)):
        return None
    ckptr = _checkpointer()
    # abstract target: shape/dtype/sharding only, so orbax places shards
    # directly on the right devices
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(
            jax.numpy.shape(x), x.dtype, sharding=getattr(x, "sharding", None)
        )
        if hasattr(x, "dtype")
        else x,
        state_template,
    )
    state = ckptr.restore(state_dir, abstract)
    with open(meta_fn) as f:
        meta = json.load(f)
    return state, int(meta["epoch"]), meta["history"]
