"""Subprocess worker for the 2-process multi-host test.

Usage: python _multihost_worker.py PROCESS_ID NUM_PROCESSES PORT

Each process owns 2 virtual CPU devices (XLA_FLAGS set by the parent test);
``initialize_multihost`` builds the 4-device global mesh, then one
data-parallel UNet2D training epoch runs through the standard trainer path
(state replicated over the global mesh, batches sharded over ``data``,
gradient psums over the Gloo-backed collectives). Prints ``FINAL_LOSS <x>``
— the parent asserts both processes computed the identical global loss.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")  # before any backend init


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from ich_tpu.parallel.mesh import initialize_multihost

    mesh = initialize_multihost(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    if nproc > 1:
        # 2 virtual CPU devices per coordinated process (parent's XLA_FLAGS)
        assert jax.device_count() == 2 * nproc, jax.device_count()
    assert mesh.devices.size == jax.device_count()

    # Establish the Gloo collective context with a trivially-compiled
    # barrier BEFORE the heavy train-step compile: on a 1-core CI box the
    # two processes compile serially, and if the first executed collective
    # is the train step's gradient psum, the faster process hits Gloo's
    # 30 s context-init rendezvous timeout while the slower one is still
    # compiling. Retry absorbs residual startup skew.
    from jax.experimental import multihost_utils

    for attempt in range(3):
        try:
            multihost_utils.sync_global_devices("ich_tpu_warmup")
            break
        except Exception:  # jax.errors.JaxRuntimeError: DEADLINE_EXCEEDED
            if attempt == 2:
                raise

    from ich_tpu.data import synthetic_ich_slices
    from ich_tpu.models import UNet
    from ich_tpu.train import UNet2D

    data = synthetic_ich_slices(n_slices=16, size=32, n_volumes=2, seed=0)
    net = UNet(depth=3, top_filter=4, p_dropout=0.0, norm="group")
    t = UNet2D(net, n_epoch=1, batch_size=8, lr=1e-3, seed=0, mesh=mesh)
    t.train(data)
    loss = t.outputs["train"]["evolution"][0][1]
    print(f"FINAL_LOSS {loss:.10f}", flush=True)


if __name__ == "__main__":
    main()
