"""fetch_pipelined: order preservation and bounded in-flight window."""

import os

import numpy as np

from ich_tpu.utils.pipeline import fetch_pipelined


def test_order_and_completeness():
    out = list(fetch_pipelined(iter(range(10)), depth=3, fetch=lambda x: x * 2))
    assert out == [i * 2 for i in range(10)]


def test_bounded_in_flight():
    """At most `depth` items may be produced-but-unfetched at any time."""
    in_flight = []
    max_seen = 0

    def produce():
        for i in range(20):
            in_flight.append(i)
            yield i

    def fetch(i):
        nonlocal max_seen
        max_seen = max(max_seen, len(in_flight))
        in_flight.remove(i)
        return i

    out = list(fetch_pipelined(produce(), depth=4, fetch=fetch))
    assert out == list(range(20))
    assert max_seen == 4


def test_depth_one_and_numpy_default():
    arrs = [np.full((2,), i) for i in range(3)]
    out = list(fetch_pipelined(iter(arrs), depth=1))
    for i, a in enumerate(out):
        np.testing.assert_array_equal(a, np.full((2,), i))


def test_enable_compilation_cache(tmp_path, monkeypatch):
    from ich_tpu.utils.cache import enable_compilation_cache

    monkeypatch.delenv("ICH_TPU_NO_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    import jax

    prev = jax.config.jax_compilation_cache_dir
    d = str(tmp_path / "xla_cache")
    try:
        assert enable_compilation_cache(d) == d
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d

        monkeypatch.setenv("ICH_TPU_NO_COMPILE_CACHE", "1")
        assert enable_compilation_cache(d) is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
