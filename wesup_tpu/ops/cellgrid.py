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


from typing import NamedTuple

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
            Awu = jnp.asarray(spp.A_wloc[u], dt)          # (W, Ws*Jw)
            g = jnp.einsum("bhw,wz->bhz", e9[..., t * 3 + u], Awu)
            Gt = g if Gt is None else Gt + g
        Aht = jnp.asarray(spp.A_hloc[t], dt)              # (H, Hs*Ih)
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
