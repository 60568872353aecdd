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
         n_iters: int = 10) -> jnp.ndarray:
    """Compute SLIC superpixel assignments fully on device.

    Args:
        rgb: (H, W, 3) float image in [0, 1].
        valid: optional (H, W) bool mask; invalid (padding) pixels are
            excluded from center updates but still receive an assignment.
        sp_area: target superpixel area in pixels (reference sp_area=200).
        compactness: SLIC compactness (reference sp_compactness=40).
        n_iters: fixed number of assignment/update iterations.

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

    scaled_feat = feat * inv_step

    # per-offset candidate validity: out-of-grid neighbor cells are masked
    # with +inf distance rather than clamped.  (Clamped candidates would
    # duplicate the unclamped ones and could win argmin ties at borders,
    # whose contributions the update's shift-add then drops.)
    invalid_bias = []
    for dy, dx in _OFFSETS:
        rv = (plan.cell_y + dy >= 0) & (plan.cell_y + dy < Kh)
        cv = (plan.cell_x + dx >= 0) & (plan.cell_x + dx < Kw)
        invalid_bias.append(np.where(np.outer(rv, cv), 0.0, np.inf))
    invalid_bias = jnp.asarray(np.stack(invalid_bias, -1), jnp.float32)

    def assign(centers):
        """Per-pixel argmin over the 9 neighboring cell centers.

        All 9 shifted center grids are stacked channel-wise so the cell->pixel
        broadcast is a single pair of constant-matrix products.
        Returns (best_offset_onehot (H, W, 9), seg (H, W) int32).
        """
        stacked = jnp.concatenate(
            [_shift_grid(centers, dy, dx) for dy, dx in _OFFSETS], axis=-1)
        cmap = _cell_to_pixel(plan, stacked, 0, 0)  # (H, W, 9*5)
        best_d = jnp.full((H, W), jnp.inf, dtype=jnp.float32)
        best_o = jnp.zeros((H, W), dtype=jnp.int32)
        for o in range(9):
            diff = scaled_feat - cmap[..., o * 5:(o + 1) * 5] * inv_step
            d = jnp.sum(diff * diff, axis=-1) + invalid_bias[..., o]
            take = d < best_d
            best_d = jnp.where(take, d, best_d)
            best_o = jnp.where(take, o, best_o)
        onehot = (best_o[..., None] ==
                  jnp.arange(9, dtype=jnp.int32)).astype(jnp.float32)
        cy = jnp.asarray(plan.cell_y)[:, None]
        cx = jnp.asarray(plan.cell_x)[None, :]
        # offset decode as arithmetic (a table gather here profiled at
        # ~16 ms/step on v5e: TPU gathers are slow even from tiny tables)
        sy = cy + best_o // 3 - 1
        sx = cx + best_o % 3 - 1
        seg = sy * Kw + sx
        return onehot, seg

    def update(centers, onehot):
        # per-pixel contribution to each of its 9 candidate clusters:
        # (H, W, 9 * 6) where 6 = 5 features + 1 count, weighted by validity
        contrib = (onehot[..., :, None] *
                   (jnp.concatenate([feat, jnp.ones((H, W, 1), jnp.float32)],
                                    -1) * weight)[..., None, :])
        contrib = contrib.reshape(H, W, 9 * 6)
        B = _bin_cells(plan, contrib).reshape(Kh, Kw, 9, 6)
        # cluster (i, j) collects cell (i - dy, j - dx) sums for offset (dy, dx)
        total = jnp.zeros((Kh, Kw, 6), jnp.float32)
        for o, (dy, dx) in enumerate(_OFFSETS):
            total = total + _shift_grid(B[:, :, o, :], -dy, -dx)
        cnt = total[..., 5:6]
        return jnp.where(cnt > 0, total[..., :5] / jnp.maximum(cnt, 1e-6),
                         centers)

    def body(_, centers):
        onehot, _ = assign(centers)
        return update(centers, onehot)

    centers = jax.lax.fori_loop(0, n_iters, body, centers, unroll=False)
    _, seg = assign(centers)
    return seg


def n_clusters(H: int, W: int, sp_area: int) -> int:
    """Static number of clusters produced by :func:`slic` for this shape."""
    return make_plan(int(H), int(W), int(sp_area)).n_clusters
