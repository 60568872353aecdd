"""Fused full-resolution superpixel pooling as a Pallas TPU kernel.

Computes stage 0's segment sums (reference semantics: the superpixel
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

__all__ = ["cell_pool0", "supports"]


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
