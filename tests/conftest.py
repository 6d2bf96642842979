"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (JAX's standard fake-backend
mechanism for exercising pjit/shard_map collectives without hardware) —
see SURVEY.md §4.

NB: this image preloads jax and exports ``JAX_PLATFORMS=axon`` (the TPU
tunnel), so the platform must be overridden via ``jax.config.update`` —
env-var defaults were already baked in at interpreter start.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# persistent XLA compilation cache: repeat test runs skip recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ich_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402  (preloaded by the image; config update still works)

jax.config.update("jax_platforms", "cpu")

# repo root on sys.path so `import ich_tpu` works without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = "/root/reference/code"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
