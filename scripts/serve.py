"""Watch-folder inference server: segment NIfTI volumes as they arrive.

Production serving companion to ``segment_brain.py``/``unet3d.py``: polls
``--watch-dir`` for new ``.nii``/``.nii.gz`` files, runs pipelined
full-volume segmentation (2.5D slice-wise or 3D sliding-window), writes
``<name>_mask.nii.gz`` to ``--output-dir`` and a ``<name>.done`` marker.
Crash-safe hand-off: masks are written to a temp name and renamed, and a
volume is only marked done after its mask is on disk, so a restarted
server (warm via the persistent compile cache; no reference equivalent —
the reference's torch pipeline has no server mode) re-processes exactly
the unfinished files.

Examples::

    python scripts/serve.py --watch-dir /in --output-dir /out \
        --model model.pkl --mode 2.5d --size 256
    python scripts/serve.py --watch-dir /in --output-dir /out \
        --model model.pkl --mode 3d --patch 64 --once   # drain and exit

``ICH_TPU_PACKING`` (auto/on/off) selects the conv packing mode at startup;
the default ("auto" = direct conv) is the measured optimum on v5e — every
lane-fill alternative, including a hand-written implicit-GEMM kernel, is a
documented negative (docs/BENCHMARKS.md "lane-bound levels").
"""

import os
import time

import click
import numpy as np

from _common import setup_logger

import logging

logger = logging.getLogger("ich_tpu.serve")

MAX_BATCH = 16  # volumes decoded per serve cycle (bounds host memory)
MAX_RETRIES = 3  # decode failures before a file is quarantined (.failed)


def _vol_name(fn: str) -> str:
    """Basename with ONLY the trailing .nii/.nii.gz stripped (a blanket
    str.replace would collapse e.g. a.nii and a.nii.gz — or scan.nii.bak —
    onto one done-marker and silently drop one of them)."""
    fn = os.path.basename(fn)
    for suf in (".nii.gz", ".nii"):
        if fn.endswith(suf):
            return fn[: -len(suf)]
    return fn


def _pending(watch_dir: str, output_dir: str, settle_s: float = 0.0):
    """Unprocessed volume paths (sorted for deterministic order). Files
    modified less than ``settle_s`` ago are skipped — an uploader may still
    be writing them (the guard is advisory; a torn file that slips through
    is caught by the per-file decode isolation + quarantine below).
    Our own ``*_mask.nii.gz`` outputs are excluded so watch_dir ==
    output_dir does not re-ingest (and endlessly re-mask) its results."""
    out = []
    seen = set()
    now = time.time()
    for fn in sorted(os.listdir(watch_dir)):
        if fn.startswith("."):
            continue  # our own .<name>_mask.tmp.* (possibly stale after a
            # crash) and other hidden files are never inputs
        if not (fn.endswith(".nii") or fn.endswith(".nii.gz")):
            continue
        name = _vol_name(fn)
        if name.endswith("_mask"):
            continue
        if name in seen:
            # a.nii AND a.nii.gz: same mask/done names, same tmp path — the
            # second would crash the cycle on os.replace. Serve the first
            # (sorted) and tell the operator to rename the other.
            logger.error("skipping %s: name %r collides with another watch "
                         "file; rename one of them", fn, name)
            continue
        seen.add(name)
        if os.path.exists(os.path.join(output_dir, f"{name}.done")):
            continue
        if os.path.exists(os.path.join(output_dir, f"{name}.failed")):
            continue
        path = os.path.join(watch_dir, fn)
        try:
            if settle_s and now - os.path.getmtime(path) < settle_s:
                continue
        except OSError:
            continue  # raced with a delete
        out.append(path)
    return out


def _build_trainer(mode, model_path, depth, top_filter, size, patch):
    import jax.numpy as jnp

    from ich_tpu.models import UNet

    if mode == "2.5d":
        from ich_tpu.train import UNet2D

        tr = UNet2D(UNet(depth=depth, top_filter=top_filter, p_dropout=0.0))
        tr.load_model(model_path, image_shape=(size, size))
    else:
        from ich_tpu.train import UNet3D

        tr = UNet3D(
            UNet(depth=depth, ndim=3, top_filter=top_filter, p_dropout=0.0,
                 norm="group", dtype=jnp.bfloat16),
            patch_size=(patch,) * 3,
        )
        tr.load_model(model_path, image_shape=(patch,) * 3)
    return tr


@click.command()
@click.option("--watch-dir", required=True, type=click.Path(exists=True))
@click.option("--output-dir", "-o", required=True, type=click.Path())
@click.option("--model", "-m", "model_path", required=True, type=click.Path(exists=True))
@click.option("--mode", type=click.Choice(["2.5d", "3d"]), default="2.5d")
@click.option("--depth", default=5, type=int)
@click.option("--top-filter", default=32, type=int)
@click.option("--size", default=256, type=int, help="2.5d network input size")
@click.option("--patch", default=64, type=int, help="3d sliding-window patch")
@click.option("--win-center", default=50.0, type=float)
@click.option("--win-width", default=200.0, type=float)
@click.option("--poll-s", default=2.0, type=float)
@click.option("--once", is_flag=True, help="drain the current backlog and exit")
def main(watch_dir, output_dir, model_path, mode, depth, top_filter, size,
         patch, win_center, win_width, poll_s, once):
    logger = setup_logger()
    from ich_tpu.data import nifti

    os.makedirs(output_dir, exist_ok=True)
    trainer = _build_trainer(mode, model_path, depth, top_filter, size, patch)
    logger.info("serving %s -> %s (%s)", watch_dir, output_dir, mode)

    while True:
        batch = _pending(watch_dir, output_dir,
                         settle_s=0.0 if once else min(poll_s, 2.0))[:MAX_BATCH]
        if not batch:
            if once:
                break
            time.sleep(poll_s)
            continue

        # decode up front with per-file isolation: one torn/corrupt upload
        # must not take down the server or wedge the queue. After
        # MAX_RETRIES decode failures a file is quarantined via a .failed
        # marker (delete it to retry).
        names, vols, affines = [], [], []
        for vp in batch:
            name = _vol_name(vp)
            retry_fn = os.path.join(output_dir, f"{name}.retries")
            try:
                vol, affine, _ = nifti.load(vp)  # NIfTI layout: (H, W, D)
            except Exception as e:
                # persist the retry count so quarantine survives restarts
                try:
                    n_fail = int(open(retry_fn).read().strip()) + 1
                except (OSError, ValueError):
                    n_fail = 1
                with open(retry_fn, "w") as f:
                    f.write(str(n_fail))
                logger.warning("decode failed (%d/%d) for %s: %s",
                               n_fail, MAX_RETRIES, vp, e)
                if n_fail >= MAX_RETRIES:
                    with open(os.path.join(output_dir, f"{name}.failed"), "w") as f:
                        f.write(f"{type(e).__name__}: {e}\n")
                    os.remove(retry_fn)
                    logger.error("quarantined %s (.failed marker)", vp)
                continue
            if os.path.exists(retry_fn):
                os.remove(retry_fn)
            names.append(name)
            affines.append(affine)
            # the 3D trainer consumes (D, H, W) (the loader convention,
            # ich_tpu/data/datasets.py); 2.5D takes (H, W, D) directly
            vols.append(np.transpose(vol, (2, 0, 1)) if mode == "3d" else vol)
        if not names:
            if once:
                break
            time.sleep(poll_s)
            continue
        tmp_fns = [os.path.join(output_dir, f".{n}_mask.tmp.nii.gz") for n in names]

        t0 = time.time()
        if mode == "3d":
            preds = trainer.segment_volumes(
                iter(vols), window=(win_center, win_width), return_preds=True,
            )
            for pred, affine, tmp in zip(preds, affines, tmp_fns):
                nifti.save(tmp, np.transpose(pred, (1, 2, 0)), affine)
        else:
            trainer.segment_volumes(
                iter(vols), affines=affines, save_fns=tmp_fns,
                window=(win_center, win_width), input_size=(size, size),
            )
        for name, tmp in zip(names, tmp_fns):
            final = os.path.join(output_dir, f"{name}_mask.nii.gz")
            os.replace(tmp, final)
            # done-marker AFTER the mask rename: a crash in between re-runs
            # the volume, never hands off a missing mask
            with open(os.path.join(output_dir, f"{name}.done"), "w") as f:
                f.write(final + "\n")
            click.echo(f"{name} -> {final}")
        logger.info("served %d volume(s) in %.1fs", len(names), time.time() - t0)
        if once and not _pending(watch_dir, output_dir):
            break


if __name__ == "__main__":
    main()
