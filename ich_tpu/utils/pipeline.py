"""Bounded async-dispatch pipelining for host loops over device calls.

JAX dispatch is asynchronous: a host loop that never fetches runs
arbitrarily far ahead of the device, pinning every in-flight input and
output buffer in HBM (linear growth with dataset size). A loop that
fetches every iteration serializes on this image's ~34 ms tunnel
round-trip instead. ``fetch_pipelined`` is the middle ground used by every
batched eval loop: keep at most ``depth`` results in flight, fetch the
oldest as new work is dispatched — device memory stays O(depth), the
device never idles, and fetches overlap compute.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Iterable, Iterator, Optional

import numpy as np


def fetch_pipelined(
    device_iter: Iterable,
    depth: int = 4,
    fetch: Optional[Callable] = None,
) -> Iterator:
    """Yield ``fetch(x)`` (default ``np.asarray``) for each item of
    ``device_iter``, keeping at most ``depth`` items un-fetched. Fetching
    the oldest result synchronizes everything dispatched before it
    (executions are in-order), so at most ``depth`` iterations' buffers are
    ever resident on device."""
    fetch = fetch or np.asarray
    q: deque = deque()
    for x in device_iter:
        q.append(x)
        if len(q) >= max(1, depth):
            yield fetch(q.popleft())
    while q:
        yield fetch(q.popleft())
