"""Pallas implicit-GEMM 3D conv for the lane-bound C_out∈{8,16,32,64} levels.

Every XLA-level lane-fill transformation for the top U-Net levels is a
measured negative (depth-to-space / block-space round 2, grouped convs
round 3 — docs/BENCHMARKS.md): the pack/unpack always lands as separate
HBM passes that break conv fusion. This kernel is the remaining avenue the
round-2 verdict pointed at: fuse the packing into the conv itself.

Formulation — one output plane (fixed batch b, depth d) per grid step,
with the lane budget split between w-offsets and output channels
(``WTILE = 128 // C_out`` w positions per lane tile):

    rows   M = (h, w0)            H x W/WTILE output-tile rows
    cols   K = (kd, kh, wa, ci)   3*3*(WTILE+2)*Cin input-window taps
    lanes  N = (dw, co)           WTILE w-offsets x C_out channels = 128

``A[(h,w0), (kd,kh,wa,ci)] = x[b, d+kd-1, h+kh-1, WTILE*w0+wa-1, ci]`` is
an im2col built in VMEM from three overlapping depth planes (reshape/concat
only — the w-window trick: pad w by (1 left, WTILE-1 right), reshape to
WTILE-blocks; a (WTILE+2)-wide window is block j + the first 2 columns of
block j+1). Planes are moved with the (W, C) axes fused into one wide
lane-dense minor dimension — a bare C=8/16/32 minor axis would be padded
to 128 lanes in VMEM/HBM (8-16x DMA inflation); the window algebra is
unchanged because the fused windows stay contiguous. The packed weights ``W2[K, (dw,co)] = W[kd, kh, wa-dw, ci, co]``
(zero unless ``wa-dw`` in {0,1,2}) are ``3/(WTILE+2)`` dense — the MXU runs
``(WTILE+2)/3``x the useful MACs (3.33x at C_out=16, 2x at C_out=32, 6x at
C_out=8, 1.33x at C_out=64) but at the full 128-lane rate instead of
``C_out/128``, e.g. a
~1.9x ceiling over XLA's direct conv at the 16->16 64-cube shape (measured
29.9 TF/s direct, round 2).

Opt-in via ``fastconv.set_packing("pallas")``. Differentiable via a custom
VJP (the input grad is itself a qualifying SAME conv and rides the kernel;
the weight grad keeps XLA's formulation), so the mode also covers training
steps. Off-TPU the kernel runs in interpret mode (tests); the TPU perf
gate lives in docs/BENCHMARKS.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128        # MXU lane budget: WTILE w-offsets x C_out channels
COUTS = (8, 16, 32, 64)       # kernel-supported C_out (lane tile 128//co)
# Enabled by default: the measured lane-bound levels. C_out=64 (wt=2,
# packed weights 3/4 dense — a 1.5x ceiling over XLA's 50%-lane direct
# conv) is opt-in via set_enabled_couts pending its TPU gate
# (benchmarks/pallas_conv_gate.py).
DEFAULT_COUTS = (8, 16, 32)
import os as _os

# ICH_TPU_PACKING=pallas64 (see fastconv) also enables the C_out=64 level
_enabled = frozenset(
    COUTS if _os.environ.get("ICH_TPU_PACKING") == "pallas64"
    else DEFAULT_COUTS)


def set_enabled_couts(couts) -> None:
    """Which C_out values :func:`qualifies`/:func:`qualifies2d` accept.
    Programs are memoized on ``fastconv.packing_key()``, which folds this
    set in — changing it never reuses a stale executable."""
    global _enabled
    couts = tuple(int(c) for c in couts)
    bad = set(couts) - set(COUTS)
    if bad:
        raise ValueError(f"unsupported C_out values {sorted(bad)}; "
                         f"kernel supports {COUTS}")
    _enabled = frozenset(couts)


def enabled_couts():
    return tuple(sorted(_enabled))


def _wtile(co: int) -> int:
    return LANES // co


def qualifies(x_shape, w_shape, itemsize: int = 2) -> bool:
    """3D SAME stride-1 3x3x3 conv, C_out in :func:`enabled_couts`, W a
    multiple of the lane tile (128/C_out), plane small enough for VMEM
    (A-matrix + slabs <= ~8 MB). ``itemsize`` is the activation dtype's byte width (the
    kernel computes in x's dtype, so a float32 activation doubles the
    footprint vs the bf16 default)."""
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    b, d, h, w, ci = x_shape
    co = w_shape[4]
    if w_shape[:3] != (3, 3, 3) or w_shape[3] != ci or co not in _enabled:
        return False
    wt = _wtile(co)
    if w % wt or w < 2 * wt or h < 4:
        return False
    if ci != 1 and (ci % 8 or ci > 128):
        return False
    k = 9 * (wt + 2) * ci
    a_bytes = (h * (w // wt)) * _round_up(k, 128) * itemsize
    # ~16 MB VMEM/core must also hold the A-build temporaries, the three
    # double-buffered plane blocks and the out tile — cap A at 6 MB
    return a_bytes <= 6 * 2 ** 20


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_weights(w: jax.Array) -> jax.Array:
    """(3, 3, 3, Ci, Co) -> (Kpad, 128) with rows (kd, kh, wa, ci) and
    lanes (dw, co)."""
    return _pack_w_axis(w)


def _emit(planes, w2, out, st, *, h, w, ci, co):
    """Shared A-build + MXU dot + output (and optional stats) write.

    ``planes``: 3 (3D) or 1 (2D) padded row blocks of shape (h+2, (w+wt)*ci)
    with the (W, C) axes fused so the lane (minor) dimension is wide and
    dense — a bare C=8/16/32 minor axis would be padded to 128 lanes in
    VMEM/HBM (8-16x inflation on every overlapping plane fetch). The im2col
    windows survive the fusion: a (wt+2)-wide w-window is the contiguous
    column range [j*wt*ci, (j*wt + wt+2)*ci) = block j + the first 2*ci
    columns of block j+1.

    ``st``: optional (1, 1, 2, co) stats ref — per-channel sum and
    sum-of-squares of this grid step's *rounded* output (epilogue fusion:
    the following GroupNorm's statistics pass never re-reads the
    activation from HBM). Computed post-rounding so they match stats taken
    from the written activation exactly."""
    wt = _wtile(co)
    nt = w // wt
    blocks = []
    for plane in planes:                    # (h+2, (w+wt)*ci)
        for kh in range(3):
            y = plane[kh:kh + h]            # (h, (w+wt)*ci)
            blocks.append(_wwindow(y, nt, wt, ci))  # (h, nt, (wt+2)*ci)
    k = len(planes) * 3 * (wt + 2) * ci
    A = jnp.stack(blocks, axis=2).reshape(h * nt, k)
    kpad = w2.shape[0]
    if kpad != k:
        A = jnp.pad(A, ((0, 0), (0, kpad - k)))
    o = jnp.dot(A, w2[:], preferred_element_type=jnp.float32)
    r = o.astype(out.dtype)
    # rows (h, nt), lanes (wt, co) -> (h, w*co) w-major co-minor
    out[0, 0] = r.reshape(h, nt * wt * co)
    if st is not None:
        rf = r.astype(jnp.float32).reshape(h * nt, wt, co)
        st[0, 0] = jnp.stack(
            [jnp.sum(rf, axis=(0, 1)), jnp.sum(rf * rf, axis=(0, 1))])


def _kernel(x0, x1, x2, w2, out, *, h, w, ci, co):
    _emit([r[0, 0] for r in (x0, x1, x2)], w2, out, None,
          h=h, w=w, ci=ci, co=co)


def _kernel_st(x0, x1, x2, w2, out, st, *, h, w, ci, co):
    _emit([r[0, 0] for r in (x0, x1, x2)], w2, out, st,
          h=h, w=w, ci=ci, co=co)


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        return True


# --------------------------------------------------------------------------
# Prologue-fused variants: conv(relu(x * a + b), w) for per-(sample,
# channel) affines a, b — the shape GroupNorm's normalize takes once its
# statistics are folded (layers.FlatGroupNorm: y = x*sc + sh). Fusing the
# normalize+ReLU into the A-build removes its whole-activation write+read:
# the kernel already loads x, and the affine is VPU work on the resident
# plane. SAME-padding must stay zero *post*-relu (relu(b) can be > 0), so
# pad rows/columns (and, in 3D, whole pad planes) are masked back to zero
# after the affine — statically, from iota row/column indices and the
# depth program id. Eval-only: no VJP is defined (ConvBlock gates the
# fused path on ``train=False``).
# --------------------------------------------------------------------------


def _pro_masks(wci: int, ci: int, w: int):
    """Column mask over the fused (w-position, ci) minor axis: real image
    columns are w positions 1..w of the padded row (0 is SAME pad, the
    trailing wt-1 are lane-tile extension pad)."""
    wpos = jax.lax.broadcasted_iota(jnp.int32, (1, wci), 1) // ci
    return jnp.logical_and(wpos >= 1, wpos <= w)


def _kernel_pro(x0, x1, x2, asc, bsh, w2, out, *, h, w, ci, co, d):
    _emit(_pro3d((x0, x1, x2), asc, bsh, h=h, w=w, ci=ci, co=co, d=d),
          w2, out, None, h=h, w=w, ci=ci, co=co)


def _kernel_pro_st(x0, x1, x2, asc, bsh, w2, out, st, *, h, w, ci, co, d):
    _emit(_pro3d((x0, x1, x2), asc, bsh, h=h, w=w, ci=ci, co=co, d=d),
          w2, out, st, h=h, w=w, ci=ci, co=co)


def _pro3d(refs, asc, bsh, *, h, w, ci, co, d):
    wt = _wtile(co)
    wci = (w + wt) * ci
    av = asc[0]
    bv = bsh[0]
    di = pl.program_id(1)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (h + 2, 1), 0)
    mask2 = jnp.logical_and(
        jnp.logical_and(rows_i >= 1, rows_i <= h), _pro_masks(wci, ci, w))
    planes = []
    for kd, ref in enumerate(refs):
        raw = ref[0, 0]                     # (h+2, wci)
        # padded depth planes (indices 0 and d+1) are all-pad: mask whole
        valid = jnp.logical_and(di + kd > 0, di + kd < d + 1)
        m = jnp.logical_and(mask2, valid)
        planes.append(
            jnp.where(m, jnp.maximum(raw * av + bv, 0), 0).astype(raw.dtype))
    return planes


def _stats3d_specs(b, d, co):
    """Per-grid-step (1, 1, 2, co) stats block over a (b, d, 2, co) array."""
    spec = pl.BlockSpec((1, 1, 2, co), lambda bi, di: (bi, di, 0, 0),
                        memory_space=pltpu.VMEM)
    return spec, jax.ShapeDtypeStruct((b, d, 2, co), jnp.float32)


def _finish_stats(st, n):
    """(B, steps, 2, C) per-step sums -> per-channel (mean, mean-of-squares)
    as f32 (B, C) pairs — the inputs FlatGroupNorm's group aggregation
    takes."""
    s = jnp.sum(st, axis=1)
    return s[:, 0] / n, s[:, 1] / n


def _wspec(w2):
    """Whole packed-weight matrix resident in VMEM at every grid step."""
    return pl.BlockSpec(w2.shape, lambda bi, si: (0, 0),
                        memory_space=pltpu.VMEM)


def _affine_tiles(asc, bsh, x, w_ext, wci):
    """(B, C) affines tiled over the fused (w-position, ci) minor axis, plus
    their per-grid-step BlockSpec."""
    at = jnp.tile(asc.astype(x.dtype), (1, w_ext))
    bt = jnp.tile(bsh.astype(x.dtype), (1, w_ext))
    vec = pl.BlockSpec((1, wci), lambda bi, si: (bi, 0),
                       memory_space=pltpu.VMEM)
    return at, bt, vec


def _run(kern, kern_st, grid, in_specs, inputs, out_spec, out_shape,
         st_specs, n_elems, final_shape, interpret, stats):
    """Single pallas_call dispatch site for all eight variants
    (stats/non-stats x plain/prologue x 2D/3D): a spec/params change edits
    one place instead of eight."""
    if stats:
        st_spec, st_shape = st_specs
        out, st = pl.pallas_call(
            kern_st, grid=grid, in_specs=in_specs,
            out_specs=(out_spec, st_spec), out_shape=(out_shape, st_shape),
            interpret=interpret,
        )(*inputs)
        m, q = _finish_stats(st, n_elems)
        return out.reshape(final_shape), m, q
    out = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=out_spec, out_shape=out_shape, interpret=interpret,
    )(*inputs)
    return out.reshape(final_shape)


def _prep3d(x, co):
    """Shared 3D padding/blocking: SAME-pad, fuse (W, C) so blocks move
    lane-dense (see _emit), and build the three overlapping depth-plane
    specs + the output spec."""
    b, d, h, w, ci = x.shape
    wt = _wtile(co)
    wa = wt + 2
    wci = (w + wt) * ci
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (1, wa - 3), (0, 0)])
    xp = xp.reshape(b, d + 2, h + 2, wci)
    specs = [
        pl.BlockSpec((1, 1, h + 2, wci),
                     (lambda bi, di, kd=kd: (bi, di + kd, 0, 0)),
                     memory_space=pltpu.VMEM)
        for kd in range(3)
    ]
    out_spec = pl.BlockSpec((1, 1, h, w * co), lambda bi, di: (bi, di, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, d, h, w * co), x.dtype)
    return xp, wci, specs, out_spec, out_shape


@functools.partial(jax.jit, static_argnames=("co", "interpret", "stats"))
def _conv3d(x, w2, co: int, interpret: bool, stats: bool = False):
    b, d, h, w, ci = x.shape
    xp, _, specs, out_spec, out_shape = _prep3d(x, co)
    kw = dict(h=h, w=w, ci=ci, co=co)
    return _run(functools.partial(_kernel, **kw),
                functools.partial(_kernel_st, **kw),
                (b, d), specs + [_wspec(w2)], (xp, xp, xp, w2),
                out_spec, out_shape, _stats3d_specs(b, d, co),
                d * h * w, (b, d, h, w, co), interpret, stats)


@functools.partial(jax.jit, static_argnames=("co", "interpret", "stats"))
def _conv3d_pro(x, asc, bsh, w2, co: int, interpret: bool, stats: bool = False):
    b, d, h, w, ci = x.shape
    xp, wci, specs, out_spec, out_shape = _prep3d(x, co)
    at, bt, vec = _affine_tiles(asc, bsh, x, w + _wtile(co), wci)
    kw = dict(h=h, w=w, ci=ci, co=co, d=d)
    return _run(functools.partial(_kernel_pro, **kw),
                functools.partial(_kernel_pro_st, **kw),
                (b, d), specs + [vec, vec, _wspec(w2)],
                (xp, xp, xp, at, bt, w2), out_spec, out_shape,
                _stats3d_specs(b, d, co), d * h * w, (b, d, h, w, co),
                interpret, stats)


def conv3d_same_pro(x: jax.Array, asc: jax.Array, bsh: jax.Array,
                    w: jax.Array) -> jax.Array:
    """``conv3d_same(relu(x * a + b), w)`` with the per-(sample, channel)
    affine + ReLU fused into the kernel's A-build (GroupNorm's normalize
    once its statistics are folded — see layers.FlatGroupNorm). asc/bsh:
    (B, C_in). Eval-only: no VJP. Gate call sites with :func:`qualifies`."""
    w2 = pack_weights(w.astype(x.dtype))
    return _conv3d_pro(x, asc, bsh, w2, int(w.shape[4]), _interpret())


def conv3d_same_stats(x: jax.Array, w: jax.Array):
    """``(conv3d_same(x, w), mean, mean_sq)`` — the epilogue also emits the
    output's per-(sample, channel) f32 statistics from the VMEM-resident
    result (post-rounding, so they equal stats recomputed from the written
    activation), feeding the *following* GroupNorm without its HBM stats
    pass. Eval-only: no VJP."""
    w2 = pack_weights(w.astype(x.dtype))
    return _conv3d(x, w2, int(w.shape[4]), _interpret(), stats=True)


def conv3d_same_pro_stats(x: jax.Array, asc: jax.Array, bsh: jax.Array,
                          w: jax.Array):
    """:func:`conv3d_same_pro` + the epilogue statistics of
    :func:`conv3d_same_stats`: prologue GN-affine+relu in, output stats
    out. Eval-only."""
    w2 = pack_weights(w.astype(x.dtype))
    return _conv3d_pro(x, asc, bsh, w2, int(w.shape[4]), _interpret(),
                       stats=True)


# --------------------------------------------------------------------------
# 2D variant: same formulation minus the depth taps. One H-tile of rows per
# grid step. The ht+2 padded rows a tile needs straddle one block boundary,
# so the SAME padded image (H-blocked once, with ht-1 zero rows appended so
# block nh exists) is passed through TWO refs whose index maps are offset by
# one block: rows = block hi ++ first 2 rows of block hi+1. No row-shifted
# copies are materialized in HBM (an earlier 3-view variant wrote 3x the
# image before every call) and per-step VMEM is ~three (ht, (w+wt)*ci)
# tiles — never the whole image. Budgets assume Pallas double-buffers
# input/output blocks across grid steps (~16 MB VMEM/core total).
# --------------------------------------------------------------------------

_A_BUDGET = int(2.5 * 2 ** 20)      # A-matrix bytes per grid step
_BLK_BUDGET = int(2.5 * 2 ** 20)    # 2 input blocks + concat temp per step


def _htile2d(h: int, w: int, ci: int, co: int, itemsize: int):
    """Largest H-tile whose A-matrix + input blocks fit the VMEM budget."""
    wt = _wtile(co)
    kpad = _round_up(3 * (wt + 2) * ci, 128)
    for ht in (64, 32, 16, 8, 4):
        if h % ht:
            continue
        a = ht * (w // wt) * kpad * itemsize
        blk = 3 * ht * (w + wt) * ci * itemsize
        if a <= _A_BUDGET and blk <= _BLK_BUDGET:
            return ht
    return None


def qualifies2d(x_shape, w_shape, itemsize: int = 2) -> bool:
    """2D SAME stride-1 3x3 conv, C_out in :func:`enabled_couts`, W a
    multiple of the lane tile, and an H-tile whose working set fits VMEM."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    b, h, w, ci = x_shape
    co = w_shape[3]
    if w_shape[:2] != (3, 3) or w_shape[2] != ci or co not in _enabled:
        return False
    wt = _wtile(co)
    if w % wt or w < 2 * wt or h < 8:
        return False
    if ci != 1 and (ci % 8 or ci > 128):
        return False
    return _htile2d(h, w, ci, co, itemsize) is not None


def _pack_w_axis(w: jax.Array) -> jax.Array:
    """(*taps, 3, Ci, Co) -> (Kpad, 128): scatter the 3 w-taps of each
    leading tap combination across the (wa, dw) diagonal band; rows ordered
    (*taps, wa, ci), lanes (dw, co). Shared by the 2D and 3D packers."""
    *lead, _, ci, co = w.shape
    wt = _wtile(co)
    wa = wt + 2
    nlead = int(np.prod(lead)) if lead else 1
    wl = w.reshape(nlead, 3, ci, co)
    w2 = jnp.zeros((nlead, wa, ci, wt, co), w.dtype)
    for dw in range(wt):
        for kw in range(3):
            w2 = w2.at[:, dw + kw, :, dw, :].set(wl[:, kw])
    k = nlead * wa * ci
    w2 = w2.reshape(k, wt * co)
    kpad = _round_up(k, 128)
    if kpad != k:
        w2 = jnp.pad(w2, ((0, kpad - k), (0, 0)))
    return w2


def pack_weights2d(w: jax.Array) -> jax.Array:
    """(3, 3, Ci, Co) -> (Kpad, 128) with rows (kh, wa, ci), lanes (dw, co)."""
    return _pack_w_axis(w)


def _wwindow(y: jax.Array, nt: int, wt: int, ci: int) -> jax.Array:
    """(rows, (w+wt)*ci) -> (rows, nt, (wt+2)*ci): each lane tile's w-window
    is block j + the first 2*ci fused columns of block j+1."""
    t = y.reshape(y.shape[0], nt + 1, wt * ci)
    return jnp.concatenate([t[:, :nt], t[:, 1:nt + 1, : 2 * ci]], axis=2)


def _rows2d(x0, x1):
    # (ht+2, wci) window of padded rows: block hi + 2 rows of block hi+1
    return jnp.concatenate([x0[0, 0], x1[0, 0][:2]], axis=0)


def _kernel2d(x0, x1, w2, out, *, ht, w, ci, co):
    _emit([_rows2d(x0, x1)], w2, out, None, h=ht, w=w, ci=ci, co=co)


def _kernel2d_st(x0, x1, w2, out, st, *, ht, w, ci, co):
    _emit([_rows2d(x0, x1)], w2, out, st, h=ht, w=w, ci=ci, co=co)


def _prep2d(x, co):
    """Shared 2D padding/blocking: SAME-pad (1 row top) and extend the
    bottom so the padded image is exactly nh+1 H-blocks: block hi + the
    first 2 rows of block hi+1 give the ht+2 rows tile hi needs (ht-1 >= 1
    zero rows cover the bottom pad)."""
    b, h, w, ci = x.shape
    wt = _wtile(co)
    wa = wt + 2
    ht = _htile2d(h, w, ci, co, x.dtype.itemsize)
    if ht is None:
        raise ValueError(
            f"pallas 2D conv: shape {x.shape} does not qualify — gate call "
            "sites with qualifies2d()")
    wci = (w + wt) * ci
    nh = h // ht
    xp = jnp.pad(x, [(0, 0), (1, (nh + 1) * ht - (h + 1)), (1, wa - 3), (0, 0)])
    xq = xp.reshape(b, nh + 1, ht, wci)
    spec0 = pl.BlockSpec((1, 1, ht, wci), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((1, 1, ht, wci), lambda bi, hi: (bi, hi + 1, 0, 0),
                         memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, ht, w * co), lambda bi, hi: (bi, hi, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, nh, ht, w * co), x.dtype)
    return xq, ht, nh, wci, spec0, spec1, out_spec, out_shape


def _stats2d_specs(b, nh, co):
    spec = pl.BlockSpec((1, 1, 2, co), lambda bi, hi: (bi, hi, 0, 0),
                        memory_space=pltpu.VMEM)
    return spec, jax.ShapeDtypeStruct((b, nh, 2, co), jnp.float32)


@functools.partial(jax.jit, static_argnames=("co", "interpret", "stats"))
def _conv2d(x, w2, co: int, interpret: bool, stats: bool = False):
    b, h, w, ci = x.shape
    xq, ht, nh, wci, spec0, spec1, out_spec, out_shape = _prep2d(x, co)
    kw = dict(ht=ht, w=w, ci=ci, co=co)
    return _run(functools.partial(_kernel2d, **kw),
                functools.partial(_kernel2d_st, **kw),
                (b, nh), [spec0, spec1, _wspec(w2)], (xq, xq, w2),
                out_spec, out_shape, _stats2d_specs(b, nh, co),
                h * w, (b, h, w, co), interpret, stats)


def _pro2d(x0, x1, asc, bsh, *, ht, h, w, ci, co):
    wt = _wtile(co)
    wci = (w + wt) * ci
    rows = _rows2d(x0, x1)                  # (ht+2, wci)
    hi = pl.program_id(1)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (ht + 2, 1), 0) + hi * ht
    m = jnp.logical_and(
        jnp.logical_and(gidx >= 1, gidx <= h), _pro_masks(wci, ci, w))
    return jnp.where(
        m, jnp.maximum(rows * asc[0] + bsh[0], 0), 0).astype(rows.dtype)


def _kernel2d_pro(x0, x1, asc, bsh, w2, out, *, ht, h, w, ci, co):
    _emit([_pro2d(x0, x1, asc, bsh, ht=ht, h=h, w=w, ci=ci, co=co)],
          w2, out, None, h=ht, w=w, ci=ci, co=co)


def _kernel2d_pro_st(x0, x1, asc, bsh, w2, out, st, *, ht, h, w, ci, co):
    _emit([_pro2d(x0, x1, asc, bsh, ht=ht, h=h, w=w, ci=ci, co=co)],
          w2, out, st, h=ht, w=w, ci=ci, co=co)


@functools.partial(jax.jit, static_argnames=("co", "interpret", "stats"))
def _conv2d_pro(x, asc, bsh, w2, co: int, interpret: bool, stats: bool = False):
    b, h, w, ci = x.shape
    xq, ht, nh, wci, spec0, spec1, out_spec, out_shape = _prep2d(x, co)
    at, bt, vec = _affine_tiles(asc, bsh, x, w + _wtile(co), wci)
    kw = dict(ht=ht, h=h, w=w, ci=ci, co=co)
    return _run(functools.partial(_kernel2d_pro, **kw),
                functools.partial(_kernel2d_pro_st, **kw),
                (b, nh), [spec0, spec1, vec, vec, _wspec(w2)],
                (xq, xq, at, bt, w2), out_spec, out_shape,
                _stats2d_specs(b, nh, co), h * w, (b, h, w, co),
                interpret, stats)


def conv2d_same_pro(x: jax.Array, asc: jax.Array, bsh: jax.Array,
                    w: jax.Array) -> jax.Array:
    """2D :func:`conv3d_same_pro`. asc/bsh: (B, C_in). Eval-only."""
    w2 = pack_weights2d(w.astype(x.dtype))
    return _conv2d_pro(x, asc, bsh, w2, int(w.shape[3]), _interpret())


def conv2d_same_stats(x: jax.Array, w: jax.Array):
    """2D :func:`conv3d_same_stats`. Eval-only."""
    w2 = pack_weights2d(w.astype(x.dtype))
    return _conv2d(x, w2, int(w.shape[3]), _interpret(), stats=True)


def conv2d_same_pro_stats(x: jax.Array, asc: jax.Array, bsh: jax.Array,
                          w: jax.Array):
    """2D :func:`conv3d_same_pro_stats`. Eval-only."""
    w2 = pack_weights2d(w.astype(x.dtype))
    return _conv2d_pro(x, asc, bsh, w2, int(w.shape[3]), _interpret(),
                       stats=True)


def _conv2d_same_impl(x: jax.Array, w: jax.Array) -> jax.Array:
    w2 = pack_weights2d(w.astype(x.dtype))
    return _conv2d(x, w2, int(w.shape[3]), _interpret())


def _direct2d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def conv2d_same(x: jax.Array, w: jax.Array) -> jax.Array:
    """SAME stride-1 3x3 conv with C_out in :func:`enabled_couts` on the
    2D implicit-GEMM kernel. x: (B, H, W, Ci); w: (3, 3, Ci, Co). Same
    custom VJP structure as :func:`conv3d_same`."""
    return _conv2d_same_impl(x, w)


def _conv2d_same_fwd(x, w):
    return _conv2d_same_impl(x, w), (x, w)


def _conv2d_same_bwd(res, dy):
    x, w = res
    w_t = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3).astype(dy.dtype)
    if qualifies2d(dy.shape, w_t.shape, dy.dtype.itemsize):
        dx = _conv2d_same_impl(dy, w_t)
    else:
        dx = _direct2d(dy, w_t)
    dx = dx.astype(x.dtype)
    _, w_vjp = jax.vjp(lambda wi: _direct2d(x, wi.astype(x.dtype)), w)
    (dw,) = w_vjp(dy.astype(x.dtype))
    return dx, dw


conv2d_same.defvjp(_conv2d_same_fwd, _conv2d_same_bwd)


def _conv3d_same_impl(x: jax.Array, w: jax.Array) -> jax.Array:
    w2 = pack_weights(w.astype(x.dtype))
    return _conv3d(x, w2, int(w.shape[4]), _interpret())


def _direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@jax.custom_vjp
def conv3d_same(x: jax.Array, w: jax.Array) -> jax.Array:
    """SAME stride-1 3x3x3 conv with C_out in :func:`enabled_couts` on the
    implicit-GEMM kernel. x: (B, D, H, W, Ci); w: (3, 3, 3, Ci, Co).
    Output dtype follows x (accumulation is f32 inside the matmul).

    Differentiable: the input grad of a SAME stride-1 conv is itself a
    SAME stride-1 conv of the cotangent with rot-180, channel-swapped
    weights — a (Co -> Ci) conv that rides the kernel too when its shape
    qualifies. The weight grad keeps XLA's own formulation (a large
    batch-contraction the MXU already runs at full rate)."""
    return _conv3d_same_impl(x, w)


def _conv3d_same_fwd(x, w):
    return _conv3d_same_impl(x, w), (x, w)


def _conv3d_same_bwd(res, dy):
    x, w = res
    w_t = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4).astype(dy.dtype)
    if qualifies(dy.shape, w_t.shape, dy.dtype.itemsize):
        dx = _conv3d_same_impl(dy, w_t)
    else:
        dx = _direct(dy, w_t)
    dx = dx.astype(x.dtype)
    _, w_vjp = jax.vjp(lambda wi: _direct(x, wi.astype(x.dtype)), w)
    (dw,) = w_vjp(dy.astype(x.dtype))
    return dx, dw


conv3d_same.defvjp(_conv3d_same_fwd, _conv3d_same_bwd)

# Name kept from the C_out=16-only round-3 kernel (gate scripts, fastconv).
conv3d_same16 = conv3d_same
