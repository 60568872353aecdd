"""Superpixel pooling as Pallas TPU cell-window kernels.

Two kernels share the same structure (per-(batch, row-block) grid, local
window weights built in VMEM, one MXU dot, static placement einsum):
:func:`cell_pool0` for the full-resolution stage's one-hot segment sums,
and :func:`cell_pool_stage` (second section below) for the downsampled
stages' real-valued adjoint window weights.

cell_pool0 computes stage 0's segment sums (reference semantics: the superpixel
feature-averaging matmul, models/wesup.py:284-285, for the stage that needs
no resize):

    sums[b, k, c] = sum_{h,w: seg[b,h,w]=k} taps[b, h, w, c]

The XLA path builds the (B, H, W, K) one-hot and runs a (H*W, K)^T x
(H*W, C) matmul — ~142 GFLOP and a ~0.6 GB one-hot build at GlaS-0.5x B=8.
This kernel exploits the SLIC cell structure instead (ops/cellgrid.py
module notes): within an 8-pixel-row block, every pixel's cluster row
``sy = seg // Kw`` lies in a tiny static window around the block's base
cell row, so the block's one-hot needs only ``n = (span+3)*Kw`` columns
(padded to 128 lanes) instead of K:

  - XLA-side (free bitcasts): seg and taps reshape to (B, nhb, rows*W[, C]).
  - per (batch, block) grid step: decode window columns
    ``col = seg + (1 - cyb[block]) * Kw`` (pure arithmetic, invalid seg < 0
    maps below 0 and matches nothing), build the transposed local one-hot
    (n, rows*W) by iota-compare in VMEM, and run ONE MXU dot against the
    (rows*W, C) taps block -> (n, C) f32 partial sums.  ~6x fewer FLOPs
    than the K-wide matmul and no K-wide tensor anywhere.
  - a static 0/1 placement einsum scatters the (B, nhb, n, C) partials
    into (B, K, C) (blocks' windows overlap in k; the einsum adds them).

Exact up to fp reassociation (0/1 weights select single values; the dot
accumulates in f32).  The custom VJP mirrors the structure: d(taps)[p, :]
= dsums[seg[p], :] is the transposed selection, so the backward kernel
gathers each block's (n, C) window of dsums (one tiny placement einsum,
P^T applied per block) and selects rows with the SAME in-VMEM local
one-hot — no K-wide one-hot is ever built in either direction.

Requires assignments from :func:`wesup_tpu.ops.slic.slic` (the
cell+offset structure bounds the window); arbitrary seg must keep the
one-hot path.  Mosaic rules followed: non-transposed lhs, per-dtype
contraction precision, 128-lane padding, no lane-merging reshapes
in-kernel (the merges happen as free XLA bitcasts outside).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .slic import SlicPlan

__all__ = ["cell_pool0", "cell_pool_stage", "supports", "supports_stage"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# static per-(plan, rows) constants: block base cell rows, window size,
# placement matrix
_CONST_CACHE: dict = {}
# plan registry so the custom_vjp can be keyed on hashable ints
_PLAN_REG: dict = {}


def _plan_key(plan: SlicPlan):
    return (plan.H, plan.W, plan.Kh, plan.Kw)


def _constants(plan: SlicPlan, rows: int):
    key = _plan_key(plan) + (rows,)
    got = _CONST_CACHE.get(key)
    if got is None:
        H, Kh, Kw = plan.H, plan.Kh, plan.Kw
        nhb = H // rows
        cy = np.asarray(plan.cell_y, np.int64)
        starts = np.arange(nhb) * rows
        cyb = cy[starts].astype(np.int32)                     # (nhb,)
        span = int((cy[starts + rows - 1] - cyb).max())       # cell rows/blk
        nwin = (span + 3) * Kw                                # sy-cyb in [-1, span+1]
        n = _round_up(nwin, 128)
        P = np.zeros((nhb, n, plan.n_clusters), np.float32)
        eye = np.eye(Kw, dtype=np.float32)
        for hb in range(nhb):
            for jy in range(span + 3):
                kr = int(cyb[hb]) - 1 + jy
                if 0 <= kr < Kh:
                    P[hb, jy * Kw:(jy + 1) * Kw,
                      kr * Kw:(kr + 1) * Kw] = eye
        got = (cyb, n, P)
        _CONST_CACHE[key] = got
    return got


def supports(plan: SlicPlan, rows: int = 8) -> bool:
    """Whether the kernel handles this plan (row-divisible canvas)."""
    return plan.H % rows == 0 and plan.W >= 128


def _kernel(cyb_ref, seg_ref, taps_ref, out_ref, *, n: int, Kw: int):
    hb = pl.program_id(1)
    seg = seg_ref[0, 0]                               # (1, L) int32
    taps = taps_ref[0, 0]                             # (L, C)
    dtype = taps.dtype
    precision = (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)
    # window column: (sy - cyb + 1)*Kw + sx = seg + (1 - cyb)*Kw.
    # invalid pixels (seg < 0) stay negative and match no window column.
    col = jnp.where(seg >= 0, seg + (1 - cyb_ref[hb]) * Kw, -1)
    ids = jax.lax.broadcasted_iota(jnp.int32, (n, col.shape[-1]), 0)
    ohT = (ids == col).astype(dtype)                  # (n, L)
    out_ref[0, 0] = jax.lax.dot_general(
        ohT, taps, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32)


def _pool0_impl(plan: SlicPlan, seg: jnp.ndarray, taps: jnp.ndarray,
                rows: int) -> jnp.ndarray:
    B, H, W = seg.shape
    C = taps.shape[-1]
    cyb, n, P = _constants(plan, rows)
    nhb = H // rows
    L = rows * W
    seg2 = seg.reshape(B, nhb, 1, L)      # free bitcasts (major-dim merges)
    taps2 = taps.reshape(B, nhb, L, C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nhb),
        in_specs=[
            pl.BlockSpec((1, 1, 1, L), lambda b, h, s: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L, C), lambda b, h, s: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n, C), lambda b, h, s: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    part = pl.pallas_call(
        functools.partial(_kernel, n=n, Kw=plan.Kw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nhb, n, C), jnp.float32),
    )(jnp.asarray(cyb), seg2, taps2)
    # overlapping windows add into their clusters through the static 0/1
    # placement (tiny: ~5 GFLOP at GlaS-0.5x B=8)
    return jnp.einsum("bhjc,hjk->bkc", part, jnp.asarray(P))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3))
def _pool0(key, seg, taps, rows):
    return _pool0_impl(_PLAN_REG[key], seg, taps, rows)


def _pool0_fwd(key, seg, taps, rows):
    # the zero-size array just carries taps' dtype into the backward
    res = (seg, jnp.zeros((0,), taps.dtype))
    return _pool0_impl(_PLAN_REG[key], seg, taps, rows), res


def _bwd_kernel(cyb_ref, seg_ref, win_ref, out_ref, *, n: int, Kw: int):
    hb = pl.program_id(1)
    seg = seg_ref[0, 0]                               # (1, L) int32
    win = win_ref[0, 0]                               # (n, C)
    dtype = win.dtype
    precision = (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)
    col = jnp.where(seg >= 0, seg + (1 - cyb_ref[hb]) * Kw, -1)
    # (1, L) -> (L, 1): in-VMEM int relayout (passing seg pre-shaped
    # (..., L, 1) instead makes XLA materialize a 128x lane-padded s32
    # tensor outside — measured 6.9 ms/step of pure padding traffic)
    colT = jax.lax.transpose(col, (1, 0))
    ids = jax.lax.broadcasted_iota(jnp.int32, (colT.shape[0], n), 1)
    oh = (ids == colT).astype(dtype)                  # (L, n)
    # each oh row has at most one 1 -> pure selection, exact in any dtype
    # (Mosaic requires a 32-bit matmul accumulator; the f32->bf16 cast of
    # a selected bf16 value is identity)
    out_ref[0, 0] = jax.lax.dot_general(
        oh, win, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_impl(plan: SlicPlan, seg: jnp.ndarray, dsums: jnp.ndarray,
              rows: int, out_dtype) -> jnp.ndarray:
    B, H, W = seg.shape
    C = dsums.shape[-1]
    cyb, n, P = _constants(plan, rows)
    nhb = H // rows
    L = rows * W
    # per-block (n, C) windows of dsums: win[b,hb,j,:] = dsums[b,P_col(j),:]
    # (tiny: nhb*n*K*C MACs, ~3 GFLOP at GlaS-0.5x B=8)
    win = jnp.einsum("hjk,bkc->bhjc", jnp.asarray(P, dsums.dtype), dsums,
                     preferred_element_type=jnp.float32).astype(out_dtype)
    seg3 = seg.reshape(B, nhb, 1, L)     # major-dim split, free bitcast
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nhb),
        in_specs=[
            pl.BlockSpec((1, 1, 1, L), lambda b, h, s: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n, C), lambda b, h, s: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, L, C), lambda b, h, s: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    dtaps = pl.pallas_call(
        functools.partial(_bwd_kernel, n=n, Kw=plan.Kw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nhb, L, C), out_dtype),
    )(jnp.asarray(cyb), seg3, win)
    return dtaps.reshape(B, H, W, C)


def _pool0_bwd(key, rows, res, dsums):
    # d(taps)[b,h,w,:] = dsums[b, seg[b,h,w], :] — the transposed
    # cell-window selection, as a second Pallas kernel (the XLA one-hot
    # matmul it replaces profiled 1.2 ms + a 0.7 ms layout copy at B=8
    # 288x416; TPU gathers are 20x slower still, PERF_NOTES item 4).
    seg, dt_token = res
    dseg = np.zeros(seg.shape, dtype=jax.dtypes.float0)
    return dseg, _bwd_impl(_PLAN_REG[key], seg, dsums, rows, dt_token.dtype)


_pool0.defvjp(_pool0_fwd, _pool0_bwd)


def cell_pool0(plan: SlicPlan, seg: jnp.ndarray, taps: jnp.ndarray,
               rows: int = 8) -> jnp.ndarray:
    """(B, K, C) float32 segment sums of full-resolution ``taps``.

    ``seg`` must be validity-masked (invalid pixels < 0) and come from
    :func:`wesup_tpu.ops.slic.slic` for ``plan``'s shape.
    """
    if not supports(plan, rows):
        raise ValueError(f"unsupported plan for cell_pool0: H={plan.H}")
    key = _plan_key(plan)
    _PLAN_REG[key] = plan
    return _pool0(key, seg, taps, rows)


# ---------------------------------------------------------------------------
# Downsampled stages: weighted cell-window pooling
# ---------------------------------------------------------------------------
#
# The 'local' pooling path (models/wesup.py) computes a downsampled stage's
# segment sums as  sums = einsum(Md, taps)  with Md the (B, Hs, Kh, Ws, Kw)
# adjoint weights from cellgrid.stage_adjoint_weights.  XLA materializes the
# Kh*Kw-expanded Md (221 MB bf16 for the half-res stage at B=8 288x416) plus
# ~2 ms of layout copies around the 5-d expansion einsums — yet Md is just
# the compact (B, Hs, Ih, Ws, Jw) window weights Mc scattered by the 0/1
# expansions E_y/E_x.  This kernel pools straight from Mc, generalizing the
# stage-0 kernel from one-hot selection to an (Ih x Jw)-banded weight
# matrix: per (batch, row-block) grid step it builds the block's local
# weight matrix
#
#     W[(iy, kxw), (p, q)] = Mc[p, i, q, j]   where iy  = cy0[p] + i,
#                                                   kxw = cx0[q] + j
#
# in VMEM (Ih*Jw shifted broadcast-compares against a precomputed flat
# column base), runs ONE MXU dot against the (rows*Ws, C) taps block, and a
# static 0/1 placement matrix bins the (n, C) window partials into
# (B, K, C).  The row stride Kwide = spread(anchor_x) + Jw > Kw prevents
# column aliasing, and the placement discards out-of-range window entries
# exactly like E_y/E_x do.  Exact up to fp reassociation vs the dense path.
#
# The custom VJP mirrors it: d(taps) block = W^T @ (placement^T-gathered
# cotangent window), built with the same constants in the transposed
# orientation.  Mc itself carries no gradient (it descends from integer
# SLIC assignments), so its cotangent is structurally zero.


# registry keyed on hashable ints so the custom_vjp closes over nothing
_SPP_REG: dict = {}
_STAGE_CONST_CACHE: dict = {}


def _stage_key(plan: SlicPlan, spp) -> tuple:
    return _plan_key(plan) + (spp.Hs, spp.Ws, spp.Ih, spp.Jw)


def _stage_constants(key, rows: int):
    got = _STAGE_CONST_CACHE.get(key + (rows,))
    if got is None:
        plan, spp = _SPP_REG[key]
        Hs, Ws, Ih, Jw = spp.Hs, spp.Ws, spp.Ih, spp.Jw
        Kh, Kw = spp.Kh, spp.Kw
        Hp = _round_up(Hs, rows)
        npb = Hp // rows
        ay = np.concatenate([spp.anchor_y,
                             np.full((Hp - Hs,), spp.anchor_y[-1], np.int32)])
        ax = np.asarray(spp.anchor_x, np.int64)
        base_y = np.array([ay[hb * rows:(hb + 1) * rows].min()
                           for hb in range(npb)], np.int64)
        span = max(int((ay[hb * rows:(hb + 1) * rows].max() - base_y[hb]))
                   for hb in range(npb))
        nwin = span + Ih
        minx = int(ax.min())
        Kwide = int(ax.max()) - minx + Jw
        n = _round_up(nwin * Kwide, 8)
        L = rows * Ws
        # flat window-column base per (block, row-in-block, col)
        cy0 = ay - base_y.repeat(rows)                      # (Hp,)
        colbase = (cy0[:, None] * Kwide
                   + (ax[None, :] - minx)).astype(np.int32)  # (Hp, Ws)
        colbase = colbase.reshape(npb, 1, L)
        # placement: window col (iy, kxw) -> cluster, zero when out of range
        P = np.zeros((npb, n, Kh * Kw), np.float32)
        for hb in range(npb):
            for iy in range(nwin):
                ky = int(base_y[hb]) + iy + spp.rmin_y
                if not 0 <= ky < Kh:
                    continue
                for kxw in range(Kwide):
                    kx = kxw + minx + spp.rmin_x
                    if 0 <= kx < Kw:
                        P[hb, iy * Kwide + kxw, ky * Kw + kx] = 1.0
        # permuted banded constants so the window-weight einsums emit the
        # kernel's (B, npb, Ih*Jw, rows*Ws) layout directly: padding to Hp
        # and both reorderings are baked into the STATIC matrices, leaving
        # one (rows <-> Jw) transpose at runtime instead of the measured
        # pad + reshape-copy + transpose chain (1.65 ms/step at B=8)
        Ih, Jw = spp.Ih, spp.Jw
        A_h_perm = []
        for t in range(3):
            src = spp.A_hloc[t]                             # (H, Hs*Ih)
            dst = np.zeros((src.shape[0], npb * Ih * rows), np.float32)
            for p in range(Hs):
                hb, pr = divmod(p, rows)
                for i in range(Ih):
                    dst[:, hb * (Ih * rows) + i * rows + pr] = \
                        src[:, p * Ih + i]
            A_h_perm.append(dst)
        A_w_perm = []
        for u in range(3):
            src = spp.A_wloc[u]                             # (W, Ws*Jw)
            dst = np.zeros((src.shape[0], Jw * Ws), np.float32)
            for q in range(Ws):
                for j in range(Jw):
                    dst[:, j * Ws + q] = src[:, q * Jw + j]
            A_w_perm.append(dst)
        got = (Hp, npb, n, Kwide, colbase, P,
               tuple(A_h_perm), tuple(A_w_perm))
        _STAGE_CONST_CACHE[key + (rows,)] = got
    return got


def _mct_from_e9(key, e9: jnp.ndarray, rows: int) -> jnp.ndarray:
    """(B, npb, Ih*Jw, rows*Ws) window weights, straight from offset masks.

    Same values as cellgrid.stage_window_weights (the banded einsums with
    column-permuted constants), already padded and laid out for the
    kernel's block specs."""
    plan, spp = _SPP_REG[key]
    Ih, Jw, Ws = spp.Ih, spp.Jw, spp.Ws
    Hp, npb, n, Kwide, colbase, P, A_h_perm, A_w_perm = \
        _stage_constants(key, rows)
    B = e9.shape[0]
    dt = e9.dtype
    m = None
    for t in range(3):
        Gt = None
        for u in range(3):
            g = jnp.einsum("bhw,wz->bhz", e9[..., t * 3 + u],
                           jnp.asarray(A_w_perm[u], dt))
            Gt = g if Gt is None else Gt + g
        mt = jnp.einsum("hy,bhz->byz", jnp.asarray(A_h_perm[t], dt), Gt)
        m = mt if m is None else m + mt
    return (m.reshape(B, npb, Ih, rows, Jw, Ws)
            .transpose(0, 1, 2, 4, 3, 5)
            .reshape(B, npb, Ih * Jw, rows * Ws))


def supports_stage(plan: SlicPlan, spp, rows: int = 8) -> bool:
    """Whether the stage kernel handles these shapes (VMEM-bounded)."""
    return spp.Ws >= 16 and spp.Hs >= rows


def _stage_kernel(colbase_ref, mc_ref, taps_ref, out_ref, *,
                  n: int, Kwide: int, Ih: int, Jw: int):
    col0 = colbase_ref[0]                             # (1, L) int32
    mc = mc_ref[0, 0]                                 # (Ih*Jw, L)
    taps = taps_ref[0, 0]                             # (L, C)
    dtype = taps.dtype
    precision = (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)
    ids = jax.lax.broadcasted_iota(jnp.int32, (n, col0.shape[-1]), 0)
    # ONE (n, L) relative-offset tensor, then scalar compares per (i, j):
    # computing col0 + off inside the loop materializes Ih*Jw i32 copies
    # of the full tile (measured 25x -> scoped-VMEM OOM at stage 1)
    # (int16 rel would halve the compare width, but v5e Mosaic rejects
    # 16-bit integer comparisons: "Target does not support this comparison")
    rel = ids - col0
    W = jnp.zeros(ids.shape, dtype)
    for i in range(Ih):
        for j in range(Jw):
            # select-as-multiply: where() with a (1, L) on-true operand
            # trips a Mosaic i1 relayout ("non-singleton dim replicated
            # in destination"); the arithmetic form lowers cleanly
            sel = (rel == i * Kwide + j).astype(dtype)
            W = W + sel * mc[i * Jw + j:i * Jw + j + 1, :]
    out_ref[0, 0] = jax.lax.dot_general(
        W, taps, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32)


def _stage_fwd_impl(key, mct, taps, rows):
    plan, spp = _SPP_REG[key]
    Hs, Ws, Ih, Jw = spp.Hs, spp.Ws, spp.Ih, spp.Jw
    Hp, npb, n, Kwide, colbase, P, _, _ = _stage_constants(key, rows)
    B, C = taps.shape[0], taps.shape[-1]
    L = rows * Ws
    if Hp != Hs:
        taps = jnp.pad(taps, ((0, 0), (0, Hp - Hs), (0, 0), (0, 0)))
    taps2 = taps.reshape(B, npb, L, C)
    part = pl.pallas_call(
        functools.partial(_stage_kernel, n=n, Kwide=Kwide, Ih=Ih, Jw=Jw),
        grid=(B, npb),
        in_specs=[
            pl.BlockSpec((1, 1, L), lambda b, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Ih * Jw, L), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L, C), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n, C), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, npb, n, C), jnp.float32),
    )(jnp.asarray(colbase), mct, taps2)
    return jnp.einsum("bhjc,hjk->bkc", part, jnp.asarray(P))


def _stage_bwd_kernel(colbase_ref, mc_ref, win_ref, out_ref, *,
                      n: int, Kwide: int, Ih: int, Jw: int):
    win = win_ref[0, 0]                               # (n, C)
    dtype = win.dtype
    precision = (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)
    colT = jax.lax.transpose(colbase_ref[0], (1, 0))  # (L, 1)
    mcT = mc_ref[0, 0]                                # (L, Ih*Jw)
    ids = jax.lax.broadcasted_iota(jnp.int32, (colT.shape[0], n), 1)
    rel = ids - colT                                  # see fwd kernel note
    WT = jnp.zeros(ids.shape, dtype)
    for i in range(Ih):
        for j in range(Jw):
            sel = (rel == i * Kwide + j).astype(dtype)
            WT = WT + sel * mcT[:, i * Jw + j:i * Jw + j + 1]
    out_ref[0, 0] = jax.lax.dot_general(
        WT, win, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _stage_bwd_impl(key, mct, dsums, rows, out_dtype, B, C):
    plan, spp = _SPP_REG[key]
    Hs, Ws, Ih, Jw = spp.Hs, spp.Ws, spp.Ih, spp.Jw
    Hp, npb, n, Kwide, colbase, P, _, _ = _stage_constants(key, rows)
    L = rows * Ws
    win = jnp.einsum("hjk,bkc->bhjc", jnp.asarray(P, dsums.dtype), dsums,
                     preferred_element_type=jnp.float32).astype(out_dtype)
    # one XLA transpose here beats Ih*Jw-wide per-block relayouts in-kernel
    mctT = mct.transpose(0, 1, 3, 2)                  # (B, npb, L, Ih*Jw)
    dtaps = pl.pallas_call(
        functools.partial(_stage_bwd_kernel, n=n, Kwide=Kwide, Ih=Ih, Jw=Jw),
        grid=(B, npb),
        in_specs=[
            pl.BlockSpec((1, 1, L), lambda b, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L, Ih * Jw), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n, C), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, L, C), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, npb, L, C), out_dtype),
    )(jnp.asarray(colbase), mctT, win)
    dtaps = dtaps.reshape(B, Hp, Ws, C)
    return dtaps[:, :Hs] if Hp != Hs else dtaps


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3))
def _pool_stage(key, mct, taps, rows):
    return _stage_fwd_impl(key, mct, taps, rows)


def _pool_stage_fwd(key, mct, taps, rows):
    res = (mct, jnp.zeros((0,), taps.dtype), taps.shape[-1])
    return _stage_fwd_impl(key, mct, taps, rows), res


def _pool_stage_bwd(key, rows, res, dsums):
    mct, dt_token, C = res
    B = mct.shape[0]
    dtaps = _stage_bwd_impl(key, mct, dsums, rows, dt_token.dtype, B, C)
    # mct descends from integer SLIC assignments via cellgrid.offset_masks:
    # no differentiable leaves upstream, so its cotangent never reaches a
    # parameter — return structural zeros instead of the (large) true VJP
    return jnp.zeros(mct.shape, dt_token.dtype), dtaps


_pool_stage.defvjp(_pool_stage_fwd, _pool_stage_bwd)


def cell_pool_stage(plan: SlicPlan, spp, e9: jnp.ndarray,
                    taps: jnp.ndarray, rows: int = 8) -> jnp.ndarray:
    """(B, K, C) float32 adjoint-pooled sums of a downsampled stage.

    ``spp`` is the stage's :class:`wesup_tpu.ops.cellgrid.StagePoolPlan`,
    ``e9`` the (B, H, W, 9) offset masks, ``taps`` the (B, Hs, Ws, C)
    stage features.  Equals ``einsum(stage_adjoint_weights(spp, e9),
    taps)`` up to fp reassociation without ever expanding the weights to
    (B, Hs, Kh, Ws, Kw).
    """
    if not supports_stage(plan, spp, rows):
        raise ValueError(
            f"unsupported stage for cell_pool_stage: {spp.Hs}x{spp.Ws}")
    key = _stage_key(plan, spp)
    _SPP_REG[key] = (plan, spp)
    mct = _mct_from_e9(key, e9, rows)
    return _pool_stage(key, jax.lax.stop_gradient(mct), taps, rows)
