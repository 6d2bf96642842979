"""Output-packed small-channel convolution — filling the MXU lanes.

The U-Net zoo's hot convolutions have few output channels (8–64). On TPU a
convolution lowers to a GEMM whose *lane* (minor) dimension is the output
channel count, so a C_out=16 conv uses 16 of the MXU's 128 lanes — a hard
12.5% utilization ceiling no amount of batching fixes (rows are spatial
positions and already saturated).

The fix is algebraic, not a kernel: a SAME, stride-1, odd-kernel-k
convolution is *exactly* a stride-``s``, kernel-``(k+s-1)`` convolution that
emits ``prod(s) * C_out`` channels, followed by a depth-to-space reshape.
Each enlarged-kernel window covers the receptive fields of ``prod(s)``
neighboring outputs; the packed kernel holds ``prod(s)`` spatially-shifted
(zero-padded) copies of the original weights. Lanes grow by ``prod(s)`` at a
MAC overhead of ``prod((k+s_i-1)/k)`` — for a 3^3 conv packed 2x2x2 that is
8x the lanes for 2.37x the MACs, a ~3.4x ideal speedup on lane-bound levels.

This replaces nothing in the math: outputs are bit-identical up to float
summation order, gradients flow through the (differentiable) kernel
expansion, and parameter shapes are untouched — the packing happens inside
the forward pass.

Reference equivalence target: ``torch.nn.Conv2d/3d(padding=same)`` as used
by the reference's ConvBlock (``code/src/models/networks/UNet.py:129-177``).
"""

from __future__ import annotations

import itertools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Packing mode: "auto" (default) currently resolves to OFF — see
# packing_active() for the measured rationale; "on" forces packing wherever
# the shape qualifies (tests + experimentation); "off" disables it.
# ICH_TPU_PACKING overrides the initial mode so serving CLIs can switch
# without code changes (set_packing still wins afterwards). A fourth mode,
# "pallas" (a hand-written implicit-GEMM Mosaic kernel for the lane-bound
# C_out<=64 levels), was measured 0.49-0.87x of the direct conv at every
# level in round 4 and removed — docs/BENCHMARKS.md "documented negative".
import os as _os

_MODE = _os.environ.get("ICH_TPU_PACKING", "auto")
if _MODE not in ("auto", "on", "off"):  # pragma: no cover
    raise ValueError(
        f"ICH_TPU_PACKING must be auto/on/off, got {_MODE!r}")


def set_packing(mode: str) -> None:
    """"auto"/"off": direct conv; "on": depth-to-space lane packing."""
    global _MODE
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"unknown packing mode {mode!r}")
    _MODE = mode


def packing_key() -> str:
    """The current packing mode, for use as a cache-key component.
    ``conv_same`` reads the mode at *trace* time, so any code that memoizes
    jitted programs containing convs (sliding-window inference, the
    trainers' whole-volume programs) must include this in its cache key —
    otherwise a ``set_packing`` change silently reuses the stale
    executable."""
    return _MODE


def packing_active() -> bool:
    # "auto" resolves to OFF: isolated-conv wins (1.2-1.6x on the gated
    # shapes, docs/BENCHMARKS.md) do NOT survive in-net on v5e — the
    # depth-to-space epilogue breaks XLA's conv+norm+relu fusion and the
    # measured full U-Net forward is 0.84x. Kept available via
    # set_packing("on") for experimentation on other chips/models.
    return _MODE == "on"


def choose_pack(
    spatial: Sequence[int],
    kernel_size: Sequence[int],
    c_out: int,
    c_in: Optional[int] = None,
    lane_target: int = 128,
    max_factor: int = 4,
) -> Optional[Tuple[int, ...]]:
    """Pick per-axis pack factors, or ``None`` when packing won't help.

    The gate is *measured*, not modeled (TPU v5e, per-conv microbench,
    docs/BENCHMARKS.md): XLA's direct conv already exceeds the naive
    C_out/128 lane bound, so packing only wins where its MAC overhead is
    small relative to the lane fill —

    - ``c_in <= 16 and c_out <= 16``: full scored choice (1.28-1.58x
      measured on 64^3-scale shapes);
    - ``c_in <= 32 and c_out <= 16``: a single factor-2 axis only
      (1.18-1.22x; larger packs collapse to 0.33-0.54x on these);
    - everything else: direct (measured ~1.0x, not worth the compile).

    Candidates are scored by ``prod(s) / prod((k+s-1)/k)`` — ideal speedup
    if purely lane-bound — and every packed axis length must be divisible
    by its factor (static shapes; U-Net activations are powers of two).
    Measured for 3D only; 2D dispatch stays direct until profiled.
    """
    n = len(spatial)
    if len(kernel_size) != n or c_out >= lane_target:
        return None
    if any(k % 2 == 0 for k in kernel_size):
        return None  # even kernels have asymmetric SAME padding; skip
    if n != 3 or c_out > 16 or (c_in is not None and c_in > 32):
        return None
    if c_in is not None and c_in > 16:
        # single factor-2 axis (measured: bigger packs collapse here)
        for i in range(n):
            if spatial[i] % 2 == 0:
                return tuple(2 if j == i else 1 for j in range(n))
        return None
    options = [f for f in (1, 2, 4) if f <= max_factor]
    best, best_score = None, 1.0
    for cand in itertools.product(options, repeat=n):
        s_total = int(np.prod(cand))
        if s_total == 1 or s_total * c_out > lane_target:
            continue
        if any(d % s != 0 for d, s in zip(spatial, cand)):
            continue
        overhead = float(
            np.prod([(k + s - 1) / k for k, s in zip(kernel_size, cand)])
        )
        score = s_total / overhead
        if score > best_score + 1e-9:
            best, best_score = cand, score
    return best


def build_packed_kernel(w: jax.Array, pack: Sequence[int]) -> jax.Array:
    """(*k, Cin, Cout) -> (*(k+s-1), Cin, prod(s)*Cout).

    Packed output channel ``(delta, c)`` (delta lexicographic-major) holds
    the original kernel shifted to spatial offset ``delta`` inside the
    enlarged window, zeros elsewhere.
    """
    n = len(pack)
    k = w.shape[:n]
    shifted = []
    for delta in itertools.product(*(range(s) for s in pack)):
        pads = [(d, s - 1 - d) for d, s in zip(delta, pack)] + [(0, 0), (0, 0)]
        shifted.append(jnp.pad(w, pads))
    wp = jnp.stack(shifted, axis=-2)  # (*(k+s-1), Cin, S, Cout)
    big = tuple(ki + si - 1 for ki, si in zip(k, pack))
    return wp.reshape(big + (w.shape[-2], int(np.prod(pack)) * w.shape[-1]))


def _dim_numbers(n: int) -> jax.lax.ConvDimensionNumbers:
    spatial = "DHW"[-n:] if n <= 3 else None
    if spatial is None:
        raise ValueError("packed_conv supports 1-3 spatial dims")
    lhs = "N" + spatial + "C"
    rhs = spatial + "IO"
    return (lhs, rhs, lhs)


def packed_conv(
    x: jax.Array,
    w: jax.Array,
    pack: Sequence[int],
    precision=None,
) -> jax.Array:
    """SAME stride-1 convolution of channels-last ``x`` with odd kernel
    ``w``, computed lane-packed. Exactly equal to
    ``lax.conv_general_dilated(x, w, 1, 'SAME')`` up to summation order.
    """
    n = x.ndim - 2
    pack = tuple(int(s) for s in pack)
    wp = build_packed_kernel(w, pack)
    out = jax.lax.conv_general_dilated(
        x,
        wp,
        window_strides=pack,
        padding="SAME",
        dimension_numbers=_dim_numbers(n),
        precision=precision,
    )
    # depth-to-space: channels (delta-major, c-minor) back to spatial
    b = out.shape[0]
    blocks = out.shape[1 : 1 + n]
    c_out = w.shape[-1]
    out = out.reshape((b,) + blocks + pack + (c_out,))
    perm = [0]
    for i in range(n):
        perm += [1 + i, 1 + n + i]
    perm.append(1 + 2 * n)
    out = out.transpose(perm)
    full = tuple(bl * s for bl, s in zip(blocks, pack))
    return out.reshape((b,) + full + (c_out,))


def conv_same(
    x: jax.Array,
    w: jax.Array,
    precision=None,
) -> jax.Array:
    """SAME stride-1 channels-last conv dispatching to the packed form when
    the shape qualifies and packing is active (TPU by default)."""
    n = x.ndim - 2
    pack = (
        choose_pack(x.shape[1 : 1 + n], w.shape[:n], w.shape[-1], c_in=w.shape[-2])
        if packing_active()
        else None
    )
    if pack is not None:
        return packed_conv(x, w, pack, precision=precision)
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,) * n,
        padding="SAME",
        dimension_numbers=_dim_numbers(n),
        precision=precision,
    )
