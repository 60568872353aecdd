"""Fused segment-sum Pallas kernel: per-superpixel feature pooling.

The dense formulation (ops/segments.py) materializes the (HW, K) one-hot
assignment matrix in HBM (~140 MB bf16 per GlaS-sized image) before the MXU
matmul.  This kernel streams pixel blocks through VMEM, builds each one-hot
tile on the fly from the int32 segment ids with a broadcasted-iota compare,
and accumulates (K, C) partial sums on-chip — the assignment matrix never
exists in HBM.  This is the "segment-mean scatter kernel over the on-device
superpixel assignment map" called for by the project north star.

Grid: (C tiles, pixel blocks).  The pixel-block dimension is the minor
(fastest) grid axis, so for a fixed C tile the accumulator lives in VMEM
across all pixel blocks; it is zeroed at block 0 and written out whenever the
last block finishes.

Measured on v5e (288x416, K=630, C=1024, bf16): this kernel 3.7 ms vs the
dense XLA one-hot matmul 2.3 ms — XLA's matmul pipeline wins despite the
one-hot HBM traffic, because the in-kernel iota-compare one-hot build is VPU
bound.  The dense path therefore remains the default (ops/segments.py); this
kernel is kept as the fused alternative and for future K/C regimes where the
one-hot no longer fits HBM comfortably.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(seg_ref, feat_ref, out_ref, acc_ref, *, K: int, block_p: int):
    pb = pl.program_id(1)
    n_pb = pl.num_programs(1)

    @pl.when(pb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    seg = seg_ref[:]                      # (1, block_p) int32
    feat = feat_ref[:]                    # (block_p, c_tile)
    # one-hot tile built in VMEM directly in TRANSPOSED (K, block_p) layout:
    # Mosaic rejects a bf16 matmul with a transposed lhs ("Bad lhs type"),
    # and the iota compare is free to emit either layout.  Invalid pixels
    # carry seg = -1 and match no row.
    ids = jax.lax.broadcasted_iota(jnp.int32, (K, block_p), 0)
    onehot = (seg.reshape(1, block_p) == ids).astype(feat.dtype)
    # precision pinned by operand dtype: a global jax_default_matmul_
    # precision="highest" would request an fp32-pass contraction on bf16
    # operands, which Mosaic rejects ("Bad lhs type") — bf16 inputs use the
    # native MXU pass (and still accumulate in f32 via
    # preferred_element_type); f32 inputs keep the full-precision passes.
    precision = (jax.lax.Precision.DEFAULT if feat.dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)
    acc_ref[:] += jax.lax.dot_general(
        onehot, feat, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32)

    @pl.when(pb == n_pb - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("K", "block_p", "c_tile"))
def segment_sum_pallas(seg: jnp.ndarray, feat: jnp.ndarray, K: int,
                       *, block_p: int = 2048,
                       c_tile: int = 256) -> jnp.ndarray:
    """Segment-sum of (P, C) features by (P,) int32 ids into (K, C) float32.

    Ids outside [0, K) (e.g. -1 for invalid pixels) contribute nothing.
    P is padded to a block multiple internally (padding ids are -1).
    """
    P, C = feat.shape
    Pp = _round_up(P, block_p)
    Kp = _round_up(K, 128)
    Cp = _round_up(C, c_tile)
    if Pp != P:
        seg = jnp.pad(seg, (0, Pp - P), constant_values=-1)
        feat = jnp.pad(feat, ((0, Pp - P), (0, 0)))
    if Cp != C:
        feat = jnp.pad(feat, ((0, 0), (0, Cp - C)))

    grid = (Cp // c_tile, Pp // block_p)
    out = pl.pallas_call(
        functools.partial(_kernel, K=Kp, block_p=block_p),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_p), lambda c, p: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_p, c_tile), lambda c, p: (p, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Kp, c_tile), lambda c, p: (0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Kp, Cp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Kp, c_tile), jnp.float32)],
    )(seg.reshape(1, Pp), feat)
    return out[:K, :C]


def segment_mean_pallas(seg: jnp.ndarray, feat: jnp.ndarray, K: int,
                        counts: jnp.ndarray) -> jnp.ndarray:
    """Mean-pool via :func:`segment_sum_pallas` (counts precomputed)."""
    sums = segment_sum_pallas(seg, feat, K)
    return sums / jnp.maximum(counts[:, None], 1.0)
