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


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint_sharded(path: str, state: Any, epoch: int, history: list) -> None:
    """Write ``state`` under ``path/state`` (sharded, each host its own
    shards) + ``path/meta.json``. ``path`` is a directory."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = _checkpointer()
    state_dir = os.path.join(path, _STATE)
    # orbax refuses to overwrite a finalized checkpoint; a crash-resume
    # rewrite of the same epoch is legitimate, so clear it first
    if os.path.exists(state_dir):
        import shutil

        shutil.rmtree(state_dir)
    ckptr.save(state_dir, state)
    ckptr.wait_until_finished()
    meta_tmp = os.path.join(path, _META + ".tmp")
    with open(meta_tmp, "w") as f:
        json.dump({"epoch": int(epoch), "history": history}, f)
    os.replace(meta_tmp, os.path.join(path, _META))


def load_checkpoint_sharded(
    path: str, state_template: Any
) -> Optional[Tuple[Any, int, list]]:
    """Restore (state, epoch, history) or ``None`` when absent. Arrays come
    back with ``state_template``'s shardings (restore is shard-local on a
    mesh — no host gather)."""
    path = os.path.abspath(path)
    state_dir = os.path.join(path, _STATE)
    meta_fn = os.path.join(path, _META)
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
