"""SLIC superpixels on TPU.

The reference runs skimage's Cython SLIC on the CPU for every image inside the
training hot loop, forcing a device->host->device round trip per iteration
(reference: models/wesup.py:471-478).  This module moves the whole clustering
loop on device with a formulation designed for XLA/TPU:

* fixed K (one cluster per grid cell), fixed iteration count -> static shapes;
* the standard "each pixel only considers the 3x3 neighboring cells"
  restriction (gSLICr-style) expressed WITHOUT gathers: the cell index of a
  pixel is *static*, so the per-offset candidate-center maps are products with
  constant 0/1 selection matrices (MXU work, not gather ops);
* the center update (segment mean) expressed WITHOUT scatters: per-cell sums
  are products with constant 0/1 binning matrices, and cluster sums are a
  9-way shift-and-add over the cell grid.

Distance metric matches skimage's: D^2 = d_lab^2 + (m/S)^2 * d_xy^2 with
per-axis steps, on CIELAB features.  Divergences from skimage (documented,
validated via the oracle-accuracy acceptance test, cf.
scripts/search_slic_params.py:30-38 in the reference): cluster centers are
initialized to cell means instead of perturbed grid points, and the
``enforce_connectivity`` relabeling post-pass is not applied on device.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .colorspace import rgb2lab

_OFFSETS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


class SlicPlan(NamedTuple):
    """Static plan for a given (H, W, sp_area): all constant matrices."""

    H: int
    W: int
    Kh: int
    Kw: int
    step_y: float
    step_x: float
    # (Kh, H) / (Kw, W) 0/1 cell-binning matrices
    bin_rows: np.ndarray
    bin_cols: np.ndarray
    # per offset: (H, Kh) / (W, Kw) 0/1 selection matrices mapping cell grid
    # -> pixel map for neighbor cell (cy+dy, cx+dx) (clipped at borders)
    sel_rows: list
    sel_cols: list
    # (H,) / (W,) int32 cell index per pixel row/col
    cell_y: np.ndarray
    cell_x: np.ndarray

    @property
    def n_clusters(self) -> int:
        return self.Kh * self.Kw


@functools.lru_cache(maxsize=None)
def make_plan(H: int, W: int, sp_area: int) -> SlicPlan:
    step = math.sqrt(sp_area)
    Kh = max(1, int(round(H / step)))
    Kw = max(1, int(round(W / step)))
    step_y = H / Kh
    step_x = W / Kw

    cell_y = np.minimum((np.arange(H) / step_y).astype(np.int32), Kh - 1)
    cell_x = np.minimum((np.arange(W) / step_x).astype(np.int32), Kw - 1)

    bin_rows = np.zeros((Kh, H), dtype=np.float32)
    bin_rows[cell_y, np.arange(H)] = 1.0
    bin_cols = np.zeros((Kw, W), dtype=np.float32)
    bin_cols[cell_x, np.arange(W)] = 1.0

    sel_rows, sel_cols = [], []
    for d in (-1, 0, 1):
        ry = np.clip(cell_y + d, 0, Kh - 1)
        Sr = np.zeros((H, Kh), dtype=np.float32)
        Sr[np.arange(H), ry] = 1.0
        sel_rows.append(Sr)
        rx = np.clip(cell_x + d, 0, Kw - 1)
        Sc = np.zeros((W, Kw), dtype=np.float32)
        Sc[np.arange(W), rx] = 1.0
        sel_cols.append(Sc)

    return SlicPlan(H, W, Kh, Kw, step_y, step_x, bin_rows, bin_cols,
                    sel_rows, sel_cols, cell_y, cell_x)


def _cell_to_pixel(plan: SlicPlan, grid: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Broadcast a (Kh, Kw, F) cell grid to (H, W, F) pixel maps for the
    neighbor cell at offset (dy, dx), as two constant matmuls."""
    Sr = jnp.asarray(plan.sel_rows[dy + 1])  # (H, Kh)
    Sc = jnp.asarray(plan.sel_cols[dx + 1])  # (W, Kw)
    F = grid.shape[-1]
    x = jnp.einsum("hk,kwf->hwf", Sr, grid)
    x = jnp.einsum("wk,hkf->hwf", Sc, x)
    return x.reshape(plan.H, plan.W, F)


def _bin_cells(plan: SlicPlan, pix: jnp.ndarray) -> jnp.ndarray:
    """Sum a (H, W, F) pixel array into its (Kh, Kw, F) cells (two matmuls)."""
    Br = jnp.asarray(plan.bin_rows)  # (Kh, H)
    Bc = jnp.asarray(plan.bin_cols)  # (Kw, W)
    x = jnp.einsum("kh,hwf->kwf", Br, pix)
    x = jnp.einsum("lw,kwf->klf", Bc, x)
    return x


def _shift_grid(grid: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift a (Kh, Kw, F) grid by (dy, dx), zero-filling (no wraparound)."""
    Kh, Kw = grid.shape[:2]
    out = grid
    if dy:
        pad = jnp.zeros_like(out[:abs(dy)])
        out = (jnp.concatenate([out[dy:], pad], 0) if dy > 0
               else jnp.concatenate([pad, out[:dy]], 0))
    if dx:
        pad = jnp.zeros_like(out[:, :abs(dx)])
        out = (jnp.concatenate([out[:, dx:], pad], 1) if dx > 0
               else jnp.concatenate([pad, out[:, :dx]], 1))
    return out


def slic(rgb: jnp.ndarray, valid: jnp.ndarray | None = None, *,
         sp_area: int = 200, compactness: float = 40.0,
         n_iters: int = 10, update_stride: int = 1) -> jnp.ndarray:
    """Compute SLIC superpixel assignments fully on device.

    Args:
        rgb: (H, W, 3) float image in [0, 1].
        valid: optional (H, W) bool mask; invalid (padding) pixels are
            excluded from center updates but still receive an assignment.
        sp_area: target superpixel area in pixels (reference sp_area=200).
        compactness: SLIC compactness (reference sp_compactness=40).
        n_iters: fixed number of assignment/update iterations.
        update_stride: center-update subsampling.  With stride s the
            iterative assign/update runs on the (H/s, W/s) strided pixel
            grid (a k-means on a regular sample of the pixels, the gSLICr
            trick), and only the FINAL assignment runs at full resolution —
            the per-iteration cost drops ~s^2.  stride 1 is the exact
            formulation; stride 2 measured within noise of it on the
            oracle-accuracy probe (tests/test_slic_quality.py).

    Returns:
        seg: (H, W) int32 cluster ids in [0, Kh*Kw).
    """

    H, W = rgb.shape[:2]
    plan = make_plan(int(H), int(W), int(sp_area))
    Kh, Kw = plan.Kh, plan.Kw

    lab = rgb2lab(rgb)
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] * jnp.ones((1, W), jnp.float32)
    xs = jnp.ones((H, 1), jnp.float32) * jnp.arange(W, dtype=jnp.float32)[None, :]
    # pixel features: (H, W, 5) = (L, a, b, y, x)
    feat = jnp.concatenate([lab, ys[..., None], xs[..., None]], axis=-1)

    if valid is None:
        weight = jnp.ones((H, W, 1), jnp.float32)
    else:
        weight = valid.astype(jnp.float32)[..., None]

    inv_step = jnp.asarray(
        [1.0, 1.0, 1.0, compactness / plan.step_y, compactness / plan.step_x],
        dtype=jnp.float32,
    )

    # init centers as per-cell means of (weighted) pixel features
    wfeat1 = jnp.concatenate([feat * weight, weight], axis=-1)  # (H, W, 6)
    cell_sums = _bin_cells(plan, wfeat1)
    cnt = cell_sums[..., 5:6]
    # cells fully inside padding: fall back to unweighted mean so the center
    # is at least geometrically sane
    cell_sums_uw = _bin_cells(plan, jnp.concatenate(
        [feat, jnp.ones((H, W, 1), jnp.float32)], axis=-1))
    centers = jnp.where(
        cnt > 0, cell_sums[..., :5] / jnp.maximum(cnt, 1e-6),
        cell_sums_uw[..., :5] / jnp.maximum(cell_sums_uw[..., 5:6], 1e-6),
    )  # (Kh, Kw, 5)

    def grid_consts(iy: np.ndarray, ix: np.ndarray):
        """Constant matrices restricted to pixel rows ``iy`` / cols ``ix``."""
        cy, cx = plan.cell_y[iy], plan.cell_x[ix]
        sel_r = [np.asarray(Sr)[iy] for Sr in plan.sel_rows]  # (h, Kh)
        sel_c = [np.asarray(Sc)[ix] for Sc in plan.sel_cols]  # (w, Kw)
        bin_r = np.zeros((Kh, len(iy)), np.float32)
        bin_r[cy, np.arange(len(iy))] = 1.0
        bin_c = np.zeros((Kw, len(ix)), np.float32)
        bin_c[cx, np.arange(len(ix))] = 1.0
        # per-offset candidate validity: out-of-grid neighbor cells are
        # masked with +inf distance rather than clamped.  (Clamped
        # candidates would duplicate the unclamped ones and could win
        # argmin ties at borders, whose contributions the update's
        # shift-add then drops.)
        bias = []
        for dy, dx in _OFFSETS:
            rv = (cy + dy >= 0) & (cy + dy < Kh)
            cv = (cx + dx >= 0) & (cx + dx < Kw)
            bias.append(np.where(np.outer(rv, cv), 0.0, np.inf))
        return (cy, cx, sel_r, sel_c, jnp.asarray(bin_r), jnp.asarray(bin_c),
                jnp.asarray(np.stack(bias, -1), jnp.float32))

    def make_assign(grid, scaled_feat_g):
        cy, cx, sel_r, sel_c, _, _, bias = grid
        h, w = len(cy), len(cx)

        def assign(centers):
            """Per-pixel argmin over the 9 neighboring cell centers.

            All 9 shifted center grids are stacked channel-wise so the
            cell->pixel broadcast is a single pair of constant-matrix
            products.  Returns (onehot (h, w, 9), seg (h, w) int32).
            """
            stacked = jnp.concatenate(
                [_shift_grid(centers, dy, dx) for dy, dx in _OFFSETS],
                axis=-1)
            Sr = jnp.asarray(sel_r[1])                       # offset 0 rows
            Sc = jnp.asarray(sel_c[1])
            cmap = jnp.einsum("hk,kwf->hwf", Sr, stacked)
            cmap = jnp.einsum("wk,hkf->hwf", Sc, cmap)       # (h, w, 45)
            best_d = jnp.full((h, w), jnp.inf, dtype=jnp.float32)
            best_o = jnp.zeros((h, w), dtype=jnp.int32)
            for o in range(9):
                diff = scaled_feat_g - cmap[..., o * 5:(o + 1) * 5] * inv_step
                d = jnp.sum(diff * diff, axis=-1) + bias[..., o]
                take = d < best_d
                best_d = jnp.where(take, d, best_d)
                best_o = jnp.where(take, o, best_o)
            onehot = (best_o[..., None] ==
                      jnp.arange(9, dtype=jnp.int32)).astype(jnp.float32)
            # offset decode as arithmetic (a table gather here profiled at
            # ~16 ms/step on v5e: TPU gathers are slow even from tiny tables)
            sy = jnp.asarray(cy)[:, None] + best_o // 3 - 1
            sx = jnp.asarray(cx)[None, :] + best_o % 3 - 1
            seg = sy * Kw + sx
            return onehot, seg

        return assign

    # iteration grid: optionally a strided pixel subsample (update_stride>1)
    s = max(1, int(update_stride))
    iy = np.arange(0, H, s)
    ix = np.arange(0, W, s)
    it_grid = grid_consts(iy, ix)
    feat_it = feat[::s, ::s]
    weight_it = weight[::s, ::s]
    assign_it = make_assign(it_grid, feat_it * inv_step)
    _, _, _, _, bin_r_it, bin_c_it, _ = it_grid
    h_it, w_it = len(iy), len(ix)

    def update(centers, onehot):
        # per-pixel contribution to each of its 9 candidate clusters:
        # (h, w, 9 * 6) where 6 = 5 features + 1 count, weighted by validity
        contrib = (onehot[..., :, None] *
                   (jnp.concatenate([feat_it,
                                     jnp.ones((h_it, w_it, 1), jnp.float32)],
                                    -1) * weight_it)[..., None, :])
        contrib = contrib.reshape(h_it, w_it, 9 * 6)
        x = jnp.einsum("kh,hwf->kwf", bin_r_it, contrib)
        B = jnp.einsum("lw,kwf->klf", bin_c_it, x).reshape(Kh, Kw, 9, 6)
        # cluster (i, j) collects cell (i - dy, j - dx) sums for offset (dy, dx)
        total = jnp.zeros((Kh, Kw, 6), jnp.float32)
        for o, (dy, dx) in enumerate(_OFFSETS):
            total = total + _shift_grid(B[:, :, o, :], -dy, -dx)
        cnt = total[..., 5:6]
        return jnp.where(cnt > 0, total[..., :5] / jnp.maximum(cnt, 1e-6),
                         centers)

    def body(_, centers):
        onehot, _ = assign_it(centers)
        return update(centers, onehot)

    centers = jax.lax.fori_loop(0, n_iters, body, centers, unroll=False)

    # final assignment always at FULL resolution
    if s == 1:
        assign_full = assign_it
    else:
        full_grid = grid_consts(np.arange(H), np.arange(W))
        assign_full = make_assign(full_grid, feat * inv_step)
    _, seg = assign_full(centers)
    return seg


def n_clusters(H: int, W: int, sp_area: int) -> int:
    """Static number of clusters produced by :func:`slic` for this shape."""
    return make_plan(int(H), int(W), int(sp_area)).n_clusters
