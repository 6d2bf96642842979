"""Checkpoint store + cross-task weight transfer.

Logical contents mirror the reference's per-trainer checkpoint dict
``{n_epoch_finished, net_state, optimizer_state, lr_state, loss_evolution}``
(reference ``UNet2D.py:169-176``) as a single-file msgpack-serialized pytree,
with the same crash-resume semantics (missing file → fresh start,
``UNet2D.py:109-121``). Final weights are saved as a bare params pytree
(``save_model``, ``UNet2D.py:339-348``).

``transfer_weights`` reproduces the reference's key-intersection state-dict
transfer (``UNet2D.py:316-337``) on flattened parameter paths, with the
freeze option of ``Contrastive.transfer_weights`` (``Contrastive.py:227-253``)
exposed as an optax mask.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Optional, Tuple

import flax.serialization
import jax
import numpy as np

logger = logging.getLogger(__name__)


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Any, epoch: int, history: list) -> None:
    """Atomic single-file checkpoint: {epoch, state-pytree, history}."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "epoch": int(epoch),
        "state": _to_host(state),
        "history_json": json.dumps(history),
    }
    blob = flax.serialization.to_bytes(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
        f.flush()
        os.fsync(f.fileno())  # the atomic rename only helps if the data
        # blocks are durable first — without it a power loss can leave a
        # truncated (undecodable) checkpoint behind the new name
    os.replace(tmp, path)


def load_checkpoint(path: str, state_template: Any) -> Optional[Tuple[Any, int, list]]:
    """Restore (state, epoch, history) or None if no checkpoint exists —
    the reference's try/except-FileNotFoundError resume."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        blob = f.read()
    template = {
        "epoch": 0,
        "state": _to_host(state_template),
        "history_json": "",
    }
    payload = flax.serialization.from_bytes(template, blob)
    # from_bytes already restored into the template's structure
    state = payload["state"]
    return state, int(payload["epoch"]), json.loads(payload["history_json"])


def is_sharded_path(path: str) -> bool:
    """Checkpoint paths ending in a path separator opt into the orbax
    sharded directory store (multi-host path); plain file paths use the
    single-file msgpack store."""
    return path.endswith("/") or path.endswith(os.sep)


def save_checkpoint_auto(path: str, state: Any, epoch: int, history: list) -> None:
    """Dispatch to the sharded (orbax, ``path/``) or single-file store."""
    if is_sharded_path(path):
        from ich_tpu.train import checkpoint_orbax

        checkpoint_orbax.save_checkpoint_sharded(path, state, epoch, history)
    else:
        save_checkpoint(path, state, epoch, history)


def load_checkpoint_auto(path: str, state_template: Any) -> Optional[Tuple[Any, int, list]]:
    if is_sharded_path(path):
        from ich_tpu.train import checkpoint_orbax

        return checkpoint_orbax.load_checkpoint_sharded(path, state_template)
    return load_checkpoint(path, state_template)


def save_params(path: str, params: Any) -> None:
    """Bare weights export (reference ``save_model``)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(_to_host(params)))


def load_params(path: str, params_template: Any) -> Any:
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(_to_host(params_template), f.read())


def _flatten(tree: Any) -> dict:
    flat = jax.tree_util.tree_leaves_with_path(tree)
    return {jax.tree_util.keystr(p): (p, v) for p, v in flat}


def transfer_weights(
    target: Any, source: Any, verbose: bool = False, strict_shapes: bool = True
) -> Tuple[Any, list]:
    """Copy every leaf of ``source`` whose path exists in ``target`` (and
    matches shape) into ``target``; return (new_target, transferred_paths).

    Both arguments are variable pytrees (params, or {'params':..,
    'batch_stats':..}). Non-matching paths are left untouched — the
    reference's key-intersection ``state_dict.update`` semantics.
    """
    tgt_flat = _flatten(target)
    src_flat = _flatten(source)
    transferred = []
    updates = {}
    for key, (path, src_val) in src_flat.items():
        if key not in tgt_flat:
            continue
        _, tgt_val = tgt_flat[key]
        if strict_shapes and np.shape(tgt_val) != np.shape(src_val):
            continue
        updates[key] = src_val
        transferred.append(key)

    def replace(path, leaf):
        key = jax.tree_util.keystr(path)
        return updates.get(key, leaf)

    new_target = jax.tree_util.tree_map_with_path(replace, target)
    if verbose:
        logger.info(
            "%d matching weight keys found on %d to be transferred (%d target keys).",
            len(transferred), len(src_flat), len(tgt_flat),
        )
    if not transferred and src_flat:
        # a transfer that moves NOTHING is always a config bug (e.g. the
        # pretrain encoder and fine-tune net built with different
        # top_filter/midchannels_factor) — failing loudly beats silently
        # fine-tuning from random init
        raise ValueError(
            f"transfer_weights: none of the {len(src_flat)} source keys "
            f"matched the target (by path and shape) — the architectures "
            f"are incompatible; check depth/top_filter/midchannels_factor."
        )
    return new_target, transferred


def freeze_mask(params: Any, frozen_paths: list) -> Any:
    """Boolean pytree: True where the parameter should be *trained*. Feed to
    ``optax.masked`` to freeze transferred weights (reference
    ``Contrastive.py:227-253`` sets ``requires_grad=False``)."""
    frozen = set(frozen_paths)

    def mark(path, leaf):
        return jax.tree_util.keystr(path) not in frozen

    return jax.tree_util.tree_map_with_path(mark, params)
