"""Cell-grid superpixel aggregation: exact one-hot-free pooling/painting.

The dense (H*W, K) one-hot assignment matrix (ops/segments.py) is the right
tool when the pooled feature dim C is large — the MXU matmul is compute-bound
and the one-hot read is amortized.  But at GlaS-0.5x B=8 that tensor is
~1.1 GB in bf16, and every SMALL-C consumer (pixel counts C=1, prediction
painting C=1..2, point-label stats C=2..3) that touches it pays a full HBM
read of it for kilobytes of useful output.

Our SLIC (ops/slic.py) produces assignments with gSLICr structure: cluster
ids factor as ``cluster = pixel_cell + local_offset`` with the offset in a
3x3 neighborhood, and the pixel->cell maps are *static* banded 0/1 matrices
(SlicPlan).  So segment sums can be computed without any K-wide pixel tensor:

    sums[cell + o] = shift_o( bin_cells( [offset == o] * x ) )      (9 terms)

and painting is the transpose: broadcast the (Kh, Kw) cluster grid to pixels
through the 9 static neighbor-selection matrices and pick each pixel's term
by its local offset.  Everything is elementwise work plus banded constant
matmuls on (H, W, 9*C) tensors — for C<=4 that is ~60x less HBM traffic than
the one-hot path, and EXACT (0/1 weights select single values; integer sums
accumulate in f32).

These ops require the seg to come from :func:`wesup_tpu.ops.slic.slic` (or
any assignment with the same cell+offset structure for the given plan);
arbitrary segmentations must keep using ops/segments.py.

Reference semantics covered: superpixel counts / label vote
(models/wesup.py:33-52) and prediction painting (models/wesup.py:301-302).
"""

from __future__ import annotations


import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .slic import _OFFSETS, SlicPlan, _bin_cells, _shift_grid, make_plan

__all__ = ["make_plan", "local_offsets", "offset_masks", "cell_pool",
           "cell_counts", "cell_paint", "make_stage_pool_plan",
           "stage_adjoint_weights"]


def local_offsets(plan: SlicPlan, seg: jnp.ndarray) -> jnp.ndarray:
    """Decode each pixel's 3x3 local-offset index from its cluster id.

    Returns (H, W) int32 in [0, 9): ``(dy+1)*3 + (dx+1)`` where the pixel's
    cluster is cell ``(cell_y + dy, cell_x + dx)``.  Pure arithmetic on seg
    (no gathers).  Precondition: ``seg`` was produced by SLIC for this plan,
    so every offset is in range.
    """
    sy = seg // plan.Kw
    sx = seg - sy * plan.Kw
    oy = sy - jnp.asarray(plan.cell_y)[:, None]
    ox = sx - jnp.asarray(plan.cell_x)[None, :]
    return (oy + 1) * 3 + (ox + 1)


def offset_masks(plan: SlicPlan, seg: jnp.ndarray, valid, dtype):
    """(..., H, W, 9) one-hot of the local offset, validity-masked.

    Works on any leading batch dims (``local_offsets`` broadcasts the static
    cell-index constants over them).
    """
    o = local_offsets(plan, seg)
    masks = (o[..., None] == jnp.arange(9, dtype=o.dtype)).astype(dtype)
    if valid is not None:
        masks = masks * valid[..., None].astype(dtype)
    return masks


_offset_masks = offset_masks  # internal alias


def cell_pool(plan: SlicPlan, seg: jnp.ndarray, x: jnp.ndarray,
              valid=None, masks: jnp.ndarray | None = None) -> jnp.ndarray:
    """Exact segment-SUM of (H, W, C) features into (K, C), no one-hot.

    Equivalent to ``one_hot_assignment(seg, K, valid).T @ x.reshape(-1, C)``
    up to fp summation order (bitwise-exact for integer-valued f32 inputs,
    e.g. point-annotation one-hots; both binning contractions accumulate in
    f32 regardless of ``x``'s dtype).

    ``masks`` optionally supplies precomputed :func:`offset_masks` (already
    validity-masked) so callers that need them anyway share one build.
    """
    C = x.shape[-1]
    if masks is None:
        masks = _offset_masks(plan, seg, valid, x.dtype)
    contrib = (masks[..., :, None].astype(x.dtype) * x[..., None, :]).reshape(
        plan.H, plan.W, 9 * C)
    Br = jnp.asarray(plan.bin_rows, x.dtype)              # (Kh, H)
    Bc = jnp.asarray(plan.bin_cols, x.dtype)              # (Kw, W)
    rows = jnp.einsum("kh,hwf->kwf", Br, contrib,
                      preferred_element_type=jnp.float32)
    cells = jnp.einsum("lw,kwf->klf", Bc.astype(jnp.float32), rows,
                       preferred_element_type=jnp.float32
                       ).reshape(plan.Kh, plan.Kw, 9, C)
    total = jnp.zeros((plan.Kh, plan.Kw, C), cells.dtype)
    # cluster (i, j) collects cell (i - dy, j - dx) sums for offset (dy, dx)
    for o, (dy, dx) in enumerate(_OFFSETS):
        total = total + _shift_grid(cells[:, :, o, :], -dy, -dx)
    return total.reshape(plan.n_clusters, C)


def cell_counts(plan: SlicPlan, seg: jnp.ndarray, valid=None) -> jnp.ndarray:
    """Exact (K,) valid-pixel counts per superpixel (f32, no one-hot).

    Exactness note: the one-hot path sums the assignment matrix in the
    compute dtype — in bf16 counts above 256 round to even; here partial
    sums are f32 throughout, so counts are exact integers.
    """
    masks = _offset_masks(plan, seg, valid, jnp.float32)
    cells = _bin_cells(plan, masks)                       # (Kh, Kw, 9) f32
    total = jnp.zeros((plan.Kh, plan.Kw), jnp.float32)
    for o, (dy, dx) in enumerate(_OFFSETS):
        total = total + _shift_grid(cells[:, :, o:o + 1], -dy, -dx)[..., 0]
    return total.reshape(plan.n_clusters)


def cell_paint(plan: SlicPlan, seg: jnp.ndarray,
               sp_values: jnp.ndarray) -> jnp.ndarray:
    """Broadcast per-superpixel values (K,) or (K, C) back to pixels.

    Exact transpose of :func:`cell_pool`'s selection: each pixel receives
    ``sp_values[seg]`` bit-for-bit (0/1 selection matrices copy single grid
    values; the offset mask picks exactly one of the 9 neighbor broadcasts).
    Replaces the (H*W, K) paint matmul (~1.1 GB one-hot read at GlaS-0.5x
    B=8) with two banded matmuls on the (Kh, Kw) grid plus elementwise work.
    """
    squeeze = sp_values.ndim == 1
    vals = sp_values[:, None] if squeeze else sp_values
    C = vals.shape[-1]
    grid = vals.reshape(plan.Kh, plan.Kw, C)
    # stack all 9 shifted cluster grids channel-wise: ONE pair of offset-0
    # selection matmuls broadcasts them to pixel maps (same pattern as
    # slic's assign); border zero-fill is unreachable (masks are 0 there)
    stacked = jnp.concatenate(
        [_shift_grid(grid, dy, dx) for dy, dx in _OFFSETS], axis=-1)
    Sr = jnp.asarray(plan.sel_rows[1], vals.dtype)        # (H, Kh), offset 0
    Sc = jnp.asarray(plan.sel_cols[1], vals.dtype)
    cmap = jnp.einsum("hk,kwf->hwf", Sr, stacked)
    cmap = jnp.einsum("wk,hkf->hwf", Sc, cmap)            # (H, W, 9*C)
    o = local_offsets(plan, seg)
    out = jnp.zeros((plan.H, plan.W, C), vals.dtype)
    for idx in range(9):
        m = (o == idx).astype(vals.dtype)[..., None]
        out = out + m * cmap[..., idx * C:(idx + 1) * C]
    return out[..., 0] if squeeze else out


# ---------------------------------------------------------------------------
# Local adjoint-pooling weights: M = A_h^T OH A_w without OH or t_cat
# ---------------------------------------------------------------------------
#
# The adjoint pooling in models/wesup.py needs, per downsampled stage, the
# resized assignment weights M[p, q, k] = sum_{h,w} A_h[h,p] A_w[w,q]
# oh[h,w,k].  Computing that through the (B, H, W, K) one-hot costs two
# ~1 GB full-resolution K-wide tensors per step (oh and the stacked H-adjoint
# t_cat).  But oh factors over the cell grid:
#
#     oh[h,w,(ky,kx)] = sum_{t,u} e[h,w,(t,u)] [ky = cell_y(h)+t-1]
#                                              [kx = cell_x(w)+u-1]
#
# with e the 9-channel local-offset one-hot (a (B, H, W, 9) tensor, ~64x
# smaller than oh).  Because A's bands are narrow, the cluster row ky that a
# stage row p can receive mass from lies in a small static window around
# cell_y(anchor(p)) — so both constants fold into banded matrices
# A_loc[t][h, (p, i)] = A[h, p] * [cell_y(h)+t-1 = window_k(p, i)], and M is
# nine tiny (B*H, W) x (W, Ws*Jw) matmuls + three (H, Hs*Ih) contractions +
# two 0/1 window->cluster expansion einsums.  Exact up to fp reassociation.

class StagePoolPlan(NamedTuple):
    """Static constants mapping 9-channel offset masks to one stage's M."""

    Hs: int
    Ws: int
    Ih: int          # cluster-row window width per stage row
    Jw: int          # cluster-col window width per stage col
    A_hloc: tuple    # 3 x (H, Hs*Ih) f32, one per row-offset t
    A_wloc: tuple    # 3 x (W, Ws*Jw) f32, one per col-offset u
    E_y: np.ndarray  # (Hs, Ih, Kh) 0/1 window -> cluster-row expansion
    E_x: np.ndarray  # (Ws, Jw, Kw) 0/1 window -> cluster-col expansion
    anchor_y: np.ndarray  # (Hs,) cluster-row anchor per stage row
    anchor_x: np.ndarray  # (Ws,) cluster-col anchor per stage col
    rmin_y: int      # window offset: cluster row = anchor_y + i + rmin_y
    rmin_x: int      # window offset: cluster col = anchor_x + j + rmin_x
    Kh: int
    Kw: int


def _axis_local(A: np.ndarray, cell: np.ndarray, K: int):
    """Per-offset local matrices for one axis.

    A: (N_full, N_stage) interpolation matrix (<=2 nonzeros per row).
    cell: (N_full,) int cell index per full-res position.
    """
    n_full, n_stage = A.shape
    anchor = cell[np.argmax(A, axis=0)]                   # (N_stage,)
    rows, cols = np.nonzero(A)
    rel = np.concatenate([cell[rows] + t - 1 - anchor[cols]
                          for t in range(3)])
    rmin, rmax = int(rel.min()), int(rel.max())
    I = rmax - rmin + 1
    A_loc = np.zeros((3, n_full, n_stage * I), np.float32)
    for t in range(3):
        i = cell[rows] + t - 1 - anchor[cols] - rmin
        A_loc[t, rows, cols * I + i] = A[rows, cols]
    E = np.zeros((n_stage, I, K), np.float32)
    for p in range(n_stage):
        for i in range(I):
            k = anchor[p] + i + rmin
            if 0 <= k < K:
                E[p, i, k] = 1.0
    return tuple(A_loc), E, I, anchor.astype(np.int32), rmin


# ---------------------------------------------------------------------------
# On-device expansion of near-empty constant matrices.
#
# The banded window/placement matrices above are built dense on the host but
# have at most a couple of nonzeros per row.  Baking them into the program as
# dense literals inflates the serialized TPU executable by megabytes, and on
# this box every megabyte of executable costs seconds of driver-visible LOAD
# time through the axon tunnel on a persistent-cache hit (PERF_NOTES item 44:
# the <30 s compile_s bar is load-bound, not compile-bound).  So the program
# carries only the COMPACT form — per-row (column, weight) pairs, a few KB —
# and rebuilds the dense matrix on device with iota compares: exact 0/1
# placement of the identical (already-rounded) weights, bit-equal to the
# baked literal.  ``lax.optimization_barrier`` on the compact operands stops
# XLA's constant folder from re-materializing the dense literal at compile
# time; the rebuild itself is a few MB of VPU writes per invocation (noise
# next to the matmuls that consume the result).

def compact_rows(A: np.ndarray, max_nnz: int):
    """Last-axis compact (columns, weights) of a mostly-empty matrix.

    Returns (z, w): ``A.shape[:-1] + (max_nnz,)`` int32 column indices
    (-1 = empty slot) and float32 weights.  Raises if any row has more than
    ``max_nnz`` nonzeros (caller picked the wrong bound, not a data issue).
    """
    A2 = np.asarray(A).reshape(-1, A.shape[-1])
    R = A2.shape[0]
    z = np.full((R, max_nnz), -1, np.int32)
    w = np.zeros((R, max_nnz), np.float32)
    rows, cols = np.nonzero(A2)
    slot = np.zeros((R,), np.int64)
    if rows.size:
        counts = np.bincount(rows, minlength=R)
        if counts.max() > max_nnz:
            raise ValueError(
                f"row with {counts.max()} nonzeros > max_nnz={max_nnz}")
        for r, c in zip(rows, cols):
            z[r, slot[r]] = c
            w[r, slot[r]] = A2[r, c]
            slot[r] += 1
    return (z.reshape(A.shape[:-1] + (max_nnz,)),
            w.reshape(A.shape[:-1] + (max_nnz,)))


_COMPACT_CACHE: dict = {}


def _compact_cached(A: np.ndarray, max_nnz: int = 2):
    """compact_rows memoized on the (long-lived, plan-cached) array object."""
    key = (id(A), A.shape, max_nnz)
    got = _COMPACT_CACHE.get(key)
    if got is None:
        got = _COMPACT_CACHE[key] = compact_rows(A, max_nnz) + (A,)
    return got[:2]


def expand_rows(z: np.ndarray, w: np.ndarray, Z: int, dtype) -> jnp.ndarray:
    """Rebuild the dense (..., Z) matrix from :func:`compact_rows` output.

    Each slot contributes ``w * [col == z]``; slots are disjoint columns so
    the sum places each weight exactly (no fp accumulation error), and the
    weights are cast to ``dtype`` first — identical rounding to
    ``jnp.asarray(dense, dtype)`` of the baked literal.
    """
    zt = jax.lax.optimization_barrier(jnp.asarray(z, jnp.int32))
    wt = jax.lax.optimization_barrier(
        jnp.asarray(np.asarray(w, np.float32), dtype))
    ids = jax.lax.broadcasted_iota(jnp.int32, z.shape[:-1] + (Z,),
                                   z.ndim - 1)
    out = None
    for e in range(z.shape[-1]):
        term = (ids == zt[..., e:e + 1]).astype(dtype) * wt[..., e:e + 1]
        out = term if out is None else out + term
    return out


_STAGE_PLAN_CACHE: dict = {}


def make_stage_pool_plan(plan: SlicPlan, Hs: int, Ws: int,
                         align_corners: bool = True) -> StagePoolPlan:
    """Stage-pool constants for ``plan`` at stage resolution (Hs, Ws).

    Cached on the plan's defining integers (cell vectors are a pure function
    of (H, Kh) / (W, Kw)).
    """
    key = (plan.H, plan.W, plan.Kh, plan.Kw, Hs, Ws, align_corners)
    spp = _STAGE_PLAN_CACHE.get(key)
    if spp is None:
        from .resize import _interp_matrix

        A_hloc, E_y, Ih, ay, rmy = _axis_local(
            _interp_matrix(Hs, plan.H, align_corners), plan.cell_y, plan.Kh)
        A_wloc, E_x, Jw, ax, rmx = _axis_local(
            _interp_matrix(Ws, plan.W, align_corners), plan.cell_x, plan.Kw)
        spp = StagePoolPlan(Hs, Ws, Ih, Jw, A_hloc, A_wloc, E_y, E_x,
                            ay, ax, rmy, rmx, plan.Kh, plan.Kw)
        _STAGE_PLAN_CACHE[key] = spp
    return spp


def stage_window_weights(spp: StagePoolPlan, e9: jnp.ndarray) -> jnp.ndarray:
    """(B, Hs, Ih, Ws, Jw) pre-expansion window weights from offset masks.

    The compact form of the stage's adjoint pooling weights: entry
    (p, i, q, j) is the mass stage pixel (p, q) sends to cluster
    (anchor_y[p] + i + rmin_y, anchor_x[q] + j + rmin_x); the 0/1
    expansions E_y/E_x (or the equivalent Pallas placement) turn it into
    the (B, Hs, Kh, Ws, Kw) form.
    """
    B = e9.shape[0]
    dt = e9.dtype
    Mc = None
    for t in range(3):
        Gt = None
        for u in range(3):
            # (W, Ws*Jw), rebuilt on device from the compact band (<=2
            # nonzeros per row) so the executable stays small
            Awu = expand_rows(*_compact_cached(spp.A_wloc[u]),
                              spp.Ws * spp.Jw, dt)
            g = jnp.einsum("bhw,wz->bhz", e9[..., t * 3 + u], Awu)
            Gt = g if Gt is None else Gt + g
        Aht = expand_rows(*_compact_cached(spp.A_hloc[t]),
                          spp.Hs * spp.Ih, dt)            # (H, Hs*Ih)
        m = jnp.einsum("hy,bhz->byz", Aht, Gt)
        Mc = m if Mc is None else Mc + m
    return Mc.reshape(B, spp.Hs, spp.Ih, spp.Ws, spp.Jw)


def stage_adjoint_weights(spp: StagePoolPlan, e9: jnp.ndarray) -> jnp.ndarray:
    """(B, Hs, Kh, Ws, Kw) adjoint pooling weights from (B, H, W, 9) masks.

    Equals ``einsum("hp,wq,bhwk->bpqk", A_h, A_w, one_hot(seg, K))`` (with k
    split as (ky, kx)) up to fp reassociation; see module notes.  Offsets
    that would leave the cell grid never fire in SLIC output, so their
    window entries carry zero mass and the 0/1 expansions discard nothing.
    """
    dt = e9.dtype
    Mc = stage_window_weights(spp, e9)
    Ey = jnp.asarray(spp.E_y, dt)                         # (Hs, Ih, Kh)
    Ex = jnp.asarray(spp.E_x, dt)                         # (Ws, Jw, Kw)
    tmp = jnp.einsum("bpiqj,piy->bpyqj", Mc, Ey)
    return jnp.einsum("bpyqj,qjx->bpyqx", tmp, Ex)
