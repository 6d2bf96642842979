"""Pallas implicit-GEMM 3D/2D conv for the lane-bound C_out∈{8,16,32,64} levels.

Every XLA-level lane-fill transformation for the top U-Net levels is a
measured negative (depth-to-space / block-space round 2, grouped convs
round 3 — docs/BENCHMARKS.md): the pack/unpack always lands as separate
HBM passes that break conv fusion. This kernel fuses the packing into the
conv itself.

Formulation — one output plane (fixed batch b, depth d) per grid step.
The 128 MXU lanes are split between w-offsets and output channels
(``WTILE = 128 // C_out`` w positions per lane tile); the plane's
``nt = W/WTILE`` lane tiles are a static in-kernel loop. For w-block j and
tap t = (kd, kh) (3D; kh only in 2D):

    A_t[h, e]  = plane_kd[kh + h, j*WTILE*Ci + e],  e in [0, S)
    o_j[h, (dw, co)] += A_t @ W2_t                  (f32 accumulate)

where ``S = round_up((WTILE+2)*Ci, 128)`` is the per-tap window width in
*fused (w, ci) elements* and ``W2_t[e, (dw, co)] = W[t, kw=e//Ci-dw, e%Ci,
co]`` (zero outside kw∈{0,1,2}) is the banded packed weight. Everything
the kernel does is Mosaic-legal on real TPU hardware: 2D vectors only,
lane slices at 128-aligned offsets/widths (``WTILE*Ci % 128 == 0`` is a
qualify condition, i.e. ``Ci % Co == 0``), sublane row-shifts, dots, and
lane-preserving reductions — no vector reshapes or unaligned concats (the
round-3 A-build used both and Mosaic rejected them: ``tpu.reshape
(64x72)->(64x9x8)`` "unsupported shape cast", BlockSpec ``(1, wci)``).

The input moves with the (W, C) axes fused into one wide lane-dense minor
dimension — a bare C=8/16/32 minor axis would be padded to 128 lanes in
VMEM/HBM (8-16x DMA inflation). The packed weights are ``3*Ci/S`` dense —
the MXU runs ``S/(3*Ci)``x the useful MACs but at the full 128-lane rate
instead of ``C_out/128``: ceiling vs XLA's direct conv = ``(128/Co) *
(3*Ci/S)``, e.g. 1.5x at 16->16 (S=256), 2x at 96->32 (S=640), 1.5x at
64->64 (S=256).

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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _S(wt: int, ci: int) -> int:
    """Per-tap window width in fused (w, ci) elements: the (wt+2)-wide
    input window rounded up to a whole number of 128-lane tiles (the
    rounding keeps every in-kernel lane slice Mosaic-legal; the extra
    elements hit all-zero packed-weight rows)."""
    return _round_up((wt + 2) * ci, 128)


def _pad_cols(wt: int, ci: int) -> int:
    """Right pad (in w columns, on top of the 1-column SAME pad) so the
    last w-block's S-wide element slice stays in bounds."""
    s = _S(wt, ci)
    return -(-s // ci) - wt - 1       # ceil(s/ci) - (wt+1) >= 1


def _ci_ok(ci: int, co: int) -> bool:
    # WTILE*Ci % 128 == 0 <=> Ci % Co == 0: every per-block lane slice
    # starts at a 128-aligned element offset (Mosaic requirement).
    return ci % co == 0 and ci <= 128


def _vmem3d(h: int, w: int, ci: int, co: int, it: int) -> int:
    """Per-grid-step VMEM estimate: double-buffered input/output blocks,
    the resident packed weights, and one A tile + f32 accumulator."""
    wt = _wtile(co)
    s = _S(wt, ci)
    wci = (w + 1 + _pad_cols(wt, ci)) * ci
    return (2 * (3 * (h + 2) * wci + h * w * co) * it
            + 9 * s * LANES * it + h * s * it + h * LANES * 4)


def qualifies(x_shape, w_shape, itemsize: int = 2) -> bool:
    """3D SAME stride-1 3x3x3 conv, C_out in :func:`enabled_couts`,
    C_in a multiple of C_out (lane-slice alignment), W a multiple of the
    lane tile (128/C_out), and a per-step working set that fits VMEM.
    ``itemsize`` is the activation dtype's byte width (the kernel computes
    in x's dtype, so a float32 activation doubles the footprint vs the
    bf16 default)."""
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    b, d, h, w, ci = x_shape
    co = w_shape[4]
    if w_shape[:3] != (3, 3, 3) or w_shape[3] != ci or co not in _enabled:
        return False
    wt = _wtile(co)
    if w % wt or w < 2 * wt or h < 4:
        return False
    if not _ci_ok(ci, co):
        return False
    return _vmem3d(h, w, ci, co, itemsize) <= 10 * 2 ** 20


def pack_weights(w: jax.Array) -> jax.Array:
    """(3, 3, 3, Ci, Co) -> (9*S, 128) with rows (kd, kh, e) and lanes
    (dw, co)."""
    return _pack_w_axis(w)


def _emit(planes, w2, out, st, *, h, w, ci, co):
    """Shared per-plane loop: 128-aligned window slices, per-tap banded
    dots with f32 accumulation, output (and optional stats) stores.

    ``planes``: 3 (3D) or 1 (2D) padded row blocks of shape
    (h+2, (w+1+pr)*ci) with the (W, C) axes fused so the lane (minor)
    dimension is wide and dense.

    ``st``: optional (1, 1, 2, 128) stats ref — raw per-lane sum and
    sum-of-squares of this grid step's *rounded* output (epilogue fusion:
    the following GroupNorm's statistics pass never re-reads the
    activation from HBM). The (dw, co) lane groups are reduced to
    per-channel stats outside the kernel (:func:`_finish_stats`); computed
    post-rounding so they match stats taken from the written activation
    exactly."""
    wt = _wtile(co)
    nt = w // wt
    s = _S(wt, ci)
    step = wt * ci
    taps = [p[kh:kh + h] for p in planes for kh in range(3)]
    w2v = w2[:]
    sums = sqs = None
    for j in range(nt):
        o = None
        for t, tap in enumerate(taps):
            a = tap[:, j * step:j * step + s]
            d = jnp.dot(a, w2v[t * s:(t + 1) * s],
                        preferred_element_type=jnp.float32)
            o = d if o is None else o + d
        r = o.astype(out.dtype)
        out[0, 0, :, j * LANES:(j + 1) * LANES] = r
        if st is not None:
            rf = r.astype(jnp.float32)
            s1 = jnp.sum(rf, axis=0, keepdims=True)
            s2 = jnp.sum(rf * rf, axis=0, keepdims=True)
            sums = s1 if sums is None else sums + s1
            sqs = s2 if sqs is None else sqs + s2
    if st is not None:
        st[0, 0] = jnp.concatenate([sums, sqs], axis=0)


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
# depth program id. The wrapped fastconv cores carry custom VJPs over the
# unfused composition, so eval-mode grads still work.
# --------------------------------------------------------------------------


def _pro_masks(wci: int, ci: int, w: int):
    """Column mask over the fused (w-position, ci) minor axis: real image
    columns are w positions 1..w of the padded row (0 is SAME pad, the
    trailing pr are window-extension pad)."""
    wpos = jax.lax.broadcasted_iota(jnp.int32, (1, wci), 1) // ci
    return jnp.logical_and(wpos >= 1, wpos <= w)


def _kernel_pro(x0, x1, x2, asc, bsh, w2, out, *, h, w, ci, co, d):
    _emit(_pro3d((x0, x1, x2), asc, bsh, h=h, w=w, ci=ci, co=co, d=d),
          w2, out, None, h=h, w=w, ci=ci, co=co)


def _kernel_pro_st(x0, x1, x2, asc, bsh, w2, out, st, *, h, w, ci, co, d):
    _emit(_pro3d((x0, x1, x2), asc, bsh, h=h, w=w, ci=ci, co=co, d=d),
          w2, out, st, h=h, w=w, ci=ci, co=co)


def _pro3d(refs, asc, bsh, *, h, w, ci, co, d):
    wci = (w + 1 + _pad_cols(_wtile(co), ci)) * ci
    av = asc[0]                             # (1, wci)
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


def _stats3d_specs(b, d):
    """Per-grid-step (1, 1, 2, 128) raw lane-stats block over a
    (b, d, 2, 128) array (reduced to channels outside the kernel)."""
    spec = pl.BlockSpec((1, 1, 2, LANES), lambda bi, di: (bi, di, 0, 0),
                        memory_space=pltpu.VMEM)
    return spec, jax.ShapeDtypeStruct((b, d, 2, LANES), jnp.float32)


def _finish_stats(st, n, co):
    """(B, steps, 2, 128) per-step raw (dw, co)-lane sums -> per-channel
    (mean, mean-of-squares) as f32 (B, C) pairs — the inputs
    FlatGroupNorm's group aggregation takes."""
    s = jnp.sum(st, axis=1).reshape(st.shape[0], 2, _wtile(co), co)
    s = jnp.sum(s, axis=2)
    return s[:, 0] / n, s[:, 1] / n


def _wspec(w2):
    """Whole packed-weight matrix resident in VMEM at every grid step."""
    return pl.BlockSpec(w2.shape, lambda bi, si: (0, 0),
                        memory_space=pltpu.VMEM)


def _affine_tiles(asc, bsh, x, w_cols, wci):
    """(B, C) affines tiled over the fused (w-position, ci) minor axis as
    (B, 1, wci) arrays, plus their per-grid-step BlockSpec (block
    (1, 1, wci): the last two dims equal the array's — Mosaic-legal,
    unlike a (1, wci) block over (B, wci))."""
    at = jnp.tile(asc.astype(x.dtype), (1, w_cols))[:, None, :]
    bt = jnp.tile(bsh.astype(x.dtype), (1, w_cols))[:, None, :]
    vec = pl.BlockSpec((1, 1, wci), lambda bi, si: (bi, 0, 0),
                       memory_space=pltpu.VMEM)
    return at, bt, vec


def _run(kern, kern_st, grid, in_specs, inputs, out_spec, out_shape,
         st_specs, n_elems, final_shape, interpret, stats, co):
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
        m, q = _finish_stats(st, n_elems, co)
        return out.reshape(final_shape), m, q
    out = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=out_spec, out_shape=out_shape, interpret=interpret,
    )(*inputs)
    return out.reshape(final_shape)


def _prep3d(x, co):
    """Shared 3D padding/blocking: SAME-pad plus the window-extension
    columns, fuse (W, C) so blocks move lane-dense (see _emit), and build
    the three overlapping depth-plane specs + the output spec."""
    b, d, h, w, ci = x.shape
    wt = _wtile(co)
    pr = _pad_cols(wt, ci)
    wci = (w + 1 + pr) * ci
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (1, pr), (0, 0)])
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
                out_spec, out_shape, _stats3d_specs(b, d),
                d * h * w, (b, d, h, w, co), interpret, stats, co)


@functools.partial(jax.jit, static_argnames=("co", "interpret", "stats"))
def _conv3d_pro(x, asc, bsh, w2, co: int, interpret: bool, stats: bool = False):
    b, d, h, w, ci = x.shape
    xp, wci, specs, out_spec, out_shape = _prep3d(x, co)
    at, bt, vec = _affine_tiles(asc, bsh, x, wci // ci, wci)
    kw = dict(h=h, w=w, ci=ci, co=co, d=d)
    return _run(functools.partial(_kernel_pro, **kw),
                functools.partial(_kernel_pro_st, **kw),
                (b, d), specs + [vec, vec, _wspec(w2)],
                (xp, xp, xp, at, bt, w2), out_spec, out_shape,
                _stats3d_specs(b, d), d * h * w, (b, d, h, w, co),
                interpret, stats, co)


def conv3d_same_pro(x: jax.Array, asc: jax.Array, bsh: jax.Array,
                    w: jax.Array) -> jax.Array:
    """``conv3d_same(relu(x * a + b), w)`` with the per-(sample, channel)
    affine + ReLU fused into the kernel's window build (GroupNorm's
    normalize once its statistics are folded — see layers.FlatGroupNorm).
    asc/bsh: (B, C_in). Gate call sites with :func:`qualifies`."""
    w2 = pack_weights(w.astype(x.dtype))
    return _conv3d_pro(x, asc, bsh, w2, int(w.shape[4]), _interpret())


def conv3d_same_stats(x: jax.Array, w: jax.Array):
    """``(conv3d_same(x, w), mean, mean_sq)`` — the epilogue also emits the
    output's per-(sample, channel) f32 statistics from the VMEM-resident
    result (post-rounding, so they equal stats recomputed from the written
    activation), feeding the *following* GroupNorm without its HBM stats
    pass."""
    w2 = pack_weights(w.astype(x.dtype))
    return _conv3d(x, w2, int(w.shape[4]), _interpret(), stats=True)


def conv3d_same_pro_stats(x: jax.Array, asc: jax.Array, bsh: jax.Array,
                          w: jax.Array):
    """:func:`conv3d_same_pro` + the epilogue statistics of
    :func:`conv3d_same_stats`: prologue GN-affine+relu in, output stats
    out."""
    w2 = pack_weights(w.astype(x.dtype))
    return _conv3d_pro(x, asc, bsh, w2, int(w.shape[4]), _interpret(),
                       stats=True)


# --------------------------------------------------------------------------
# 2D variant: same formulation minus the depth taps. One H-tile of rows per
# grid step. The ht+2 padded rows a tile needs straddle one block boundary,
# so the SAME padded image (H-blocked once, with ht-1 zero rows appended so
# block nh exists) is passed through TWO refs whose index maps are offset by
# one block: rows = block hi ++ first 2 rows of block hi+1 (a sublane
# concat — Mosaic-legal). Per-step VMEM is ~three (ht, wci) tiles — never
# the whole image. Budgets assume Pallas double-buffers input/output blocks
# across grid steps (~16 MB VMEM/core total).
# --------------------------------------------------------------------------


def _vmem2d(ht: int, w: int, ci: int, co: int, it: int) -> int:
    wt = _wtile(co)
    s = _S(wt, ci)
    wci = (w + 1 + _pad_cols(wt, ci)) * ci
    return (2 * (2 * ht * wci + ht * w * co) * it
            + (ht + 2) * wci * it          # the concatenated rows temp
            + 3 * s * LANES * it + ht * s * it + ht * LANES * 4)


def _htile2d(h: int, w: int, ci: int, co: int, itemsize: int):
    """Largest H-tile whose per-step working set fits the VMEM budget."""
    for ht in (64, 32, 16, 8, 4):
        if h % ht:
            continue
        if _vmem2d(ht, w, ci, co, itemsize) <= 8 * 2 ** 20:
            return ht
    return None


def qualifies2d(x_shape, w_shape, itemsize: int = 2) -> bool:
    """2D SAME stride-1 3x3 conv, C_out in :func:`enabled_couts`, C_in a
    multiple of C_out, W a multiple of the lane tile, and an H-tile whose
    working set fits VMEM."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    b, h, w, ci = x_shape
    co = w_shape[3]
    if w_shape[:2] != (3, 3) or w_shape[2] != ci or co not in _enabled:
        return False
    wt = _wtile(co)
    if w % wt or w < 2 * wt or h < 8:
        return False
    if not _ci_ok(ci, co):
        return False
    return _htile2d(h, w, ci, co, itemsize) is not None


def _pack_w_axis(w: jax.Array) -> jax.Array:
    """(*taps, 3, Ci, Co) -> (ntaps*S, 128): per tap, element row e holds
    ``W[tap, kw=e//Ci - dw, e%Ci, co]`` on lane (dw, co) (zero outside
    kw∈{0,1,2} — the diagonal band that makes the window dot a SAME conv).
    Rows beyond (wt+2)*Ci (the S rounding) are all zero. Shared by the 2D
    and 3D packers."""
    *lead, _, ci, co = w.shape
    wt = _wtile(co)
    s = _S(wt, ci)
    nlead = int(np.prod(lead)) if lead else 1
    wl = w.reshape(nlead, 3, ci, co)
    e = np.arange(s)
    a = e // ci                          # w-offset of element row
    c = e % ci
    dw = np.arange(wt)
    kw = a[:, None] - dw[None, :]        # (s, wt)
    valid = jnp.asarray((kw >= 0) & (kw <= 2))
    g = wl[:, np.clip(kw, 0, 2), c[:, None], :]    # (nlead, s, wt, co)
    w2 = jnp.where(valid[None, :, :, None], g, 0)
    return w2.reshape(nlead * s, wt * co)


def pack_weights2d(w: jax.Array) -> jax.Array:
    """(3, 3, Ci, Co) -> (3*S, 128) with rows (kh, e) and lanes (dw, co)."""
    return _pack_w_axis(w)


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
    pr = _pad_cols(wt, ci)
    ht = _htile2d(h, w, ci, co, x.dtype.itemsize)
    if ht is None:
        raise ValueError(
            f"pallas 2D conv: shape {x.shape} does not qualify — gate call "
            "sites with qualifies2d()")
    wci = (w + 1 + pr) * ci
    nh = h // ht
    xp = jnp.pad(x, [(0, 0), (1, (nh + 1) * ht - (h + 1)), (1, pr), (0, 0)])
    xq = xp.reshape(b, nh + 1, ht, wci)
    spec0 = pl.BlockSpec((1, 1, ht, wci), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((1, 1, ht, wci), lambda bi, hi: (bi, hi + 1, 0, 0),
                         memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, ht, w * co), lambda bi, hi: (bi, hi, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, nh, ht, w * co), x.dtype)
    return xq, ht, nh, wci, spec0, spec1, out_spec, out_shape


def _stats2d_specs(b, nh):
    spec = pl.BlockSpec((1, 1, 2, LANES), lambda bi, hi: (bi, hi, 0, 0),
                        memory_space=pltpu.VMEM)
    return spec, jax.ShapeDtypeStruct((b, nh, 2, LANES), jnp.float32)


@functools.partial(jax.jit, static_argnames=("co", "interpret", "stats"))
def _conv2d(x, w2, co: int, interpret: bool, stats: bool = False):
    b, h, w, ci = x.shape
    xq, ht, nh, wci, spec0, spec1, out_spec, out_shape = _prep2d(x, co)
    kw = dict(ht=ht, w=w, ci=ci, co=co)
    return _run(functools.partial(_kernel2d, **kw),
                functools.partial(_kernel2d_st, **kw),
                (b, nh), [spec0, spec1, _wspec(w2)], (xq, xq, w2),
                out_spec, out_shape, _stats2d_specs(b, nh),
                h * w, (b, h, w, co), interpret, stats, co)


def _pro2d(x0, x1, asc, bsh, *, ht, h, w, ci, co):
    wci = (w + 1 + _pad_cols(_wtile(co), ci)) * ci
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
    at, bt, vec = _affine_tiles(asc, bsh, x, wci // ci, wci)
    kw = dict(ht=ht, h=h, w=w, ci=ci, co=co)
    return _run(functools.partial(_kernel2d_pro, **kw),
                functools.partial(_kernel2d_pro_st, **kw),
                (b, nh), [spec0, spec1, vec, vec, _wspec(w2)],
                (xq, xq, at, bt, w2), out_spec, out_shape,
                _stats2d_specs(b, nh), h * w, (b, h, w, co),
                interpret, stats, co)


def conv2d_same_pro(x: jax.Array, asc: jax.Array, bsh: jax.Array,
                    w: jax.Array) -> jax.Array:
    """2D :func:`conv3d_same_pro`. asc/bsh: (B, C_in)."""
    w2 = pack_weights2d(w.astype(x.dtype))
    return _conv2d_pro(x, asc, bsh, w2, int(w.shape[3]), _interpret())


def conv2d_same_stats(x: jax.Array, w: jax.Array):
    """2D :func:`conv3d_same_stats`."""
    w2 = pack_weights2d(w.astype(x.dtype))
    return _conv2d(x, w2, int(w.shape[3]), _interpret(), stats=True)


def conv2d_same_pro_stats(x: jax.Array, asc: jax.Array, bsh: jax.Array,
                          w: jax.Array):
    """2D :func:`conv3d_same_pro_stats`."""
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
