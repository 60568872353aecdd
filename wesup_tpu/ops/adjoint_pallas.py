"""Fused adjoint superpixel pooling as a Pallas TPU kernel.

Computes, for one downsampled stage with upsample matrices
``A_h (H, Hs)`` / ``A_w (W, Ws)`` (align-corners bilinear, cf.
ops/resize._interp_matrix) and assignments ``seg (B, H, W)``:

    sums[b, c, k] = sum_{u,v} (A_h^T OH A_w)[b, u, v, k] . taps[b, u, v, c]

i.e. exactly the XLA adjoint-pooling path (models/wesup.py), but the
(B, H, W, K) one-hot and the (B, *, Ws, K) adjoint intermediates never
exist in HBM: each (batch, rows) grid step builds its one-hot tiles in
VMEM from the s32 seg block, W-adjoints them row by row on the MXU into
P' (rows*Ws, K), and accumulates ``tapsT_blk (C, rows*Ws) @ P'`` into a
(C, K) VMEM scratch that is written out once per batch element.

The caller supplies ``tapsH_T`` already H-upsampled AND transposed to
(B, C, H, Ws) — one cheap XLA einsum + transpose over the SMALL
native-resolution taps (the H-upsampled tensor is Ws-wide, not W-wide).

Mosaic layout rules baked in: every matmul has a non-transposed lhs,
contraction precision is pinned per dtype (a global highest-precision
override is invalid for bf16 operands), K is padded to 128 lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(seg_ref, awt_ref, tapst_ref, out_ref, acc_ref, *,
            rows: int, W: int, Ws: int, K: int, C: int):
    hb = pl.program_id(1)
    n_hb = pl.num_programs(1)

    @pl.when(hb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    seg = seg_ref[0]                        # (rows, W) int32
    awt = awt_ref[:]                        # (Ws, W)
    dtype = awt.dtype

    precision = (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)

    # per pixel row h: one-hot (W, K) in VMEM, W-adjoint on the MXU
    # (P_h = A_w^T @ oh_h -> (Ws, K)), then accumulate tapsT_h @ P_h.
    # No reshapes/concats — Mosaic rejects lane-merging reshapes of
    # non-128-aligned dims.  (A variant that builds the whole block's
    # one-hot as one (W, rows*K) slab and W-adjoints it with a single
    # matmul measured 9.05 vs this form's 8.36 ms — the slab build costs
    # more VPU than the big matmul saves.)  seg < 0 matches no k.
    ids = jax.lax.broadcasted_iota(jnp.int32, (W, K), 1)
    acc = acc_ref[:]
    for h in range(rows):
        oh_h = (seg[h, :].reshape(W, 1) == ids).astype(dtype)   # (W, K)
        p_h = jax.lax.dot_general(
            awt, oh_h, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32).astype(dtype)   # (Ws, K)
        acc += jax.lax.dot_general(
            tapst_ref[0, :, h, :], p_h,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    @pl.when(hb == n_hb - 1)
    def _():
        out_ref[0] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("K", "rows"))
def adjoint_pool_stage(seg: jnp.ndarray, tapsH_T: jnp.ndarray,
                       A_wT: jnp.ndarray, K: int, *,
                       rows: int = 8) -> jnp.ndarray:
    """(B, C, K) float32 adjoint-pooled sums for one stage.

    Args:
        seg: (B, H, W) int32 assignments in [0, K) (invalid < 0 allowed).
        tapsH_T: (B, C, H, Ws) H-upsampled stage taps, C-major.
        A_wT: (Ws, W) transposed W-upsample matrix.
        K: number of superpixels (static).
    """
    B, H, W = seg.shape
    _, C, H2, Ws = tapsH_T.shape
    assert H2 == H, (H2, H)
    assert H % rows == 0, (H, rows)
    Kp = _round_up(K, 128)
    dtype = tapsH_T.dtype
    awt = A_wT.astype(dtype)

    grid = (B, H // rows)
    out = pl.pallas_call(
        functools.partial(_kernel, rows=rows, W=W, Ws=Ws, K=Kp, C=C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, W), lambda b, h: (b, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ws, W), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, rows, Ws), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, Kp), lambda b, h: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, Kp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, Kp), jnp.float32)],
    )(seg, awt, tapsH_T)
    return out[:, :, :K]
