"""Fused ReLU + 2x2/2 maxpool + channel zero-pad as one Pallas TPU kernel.

Motivation (PERF_NOTES round-3 final table + item 42): the VGG stage-1 ->
stage-2 boundary (reference models/wesup.py:199 torchvision vgg16 features,
pool after conv1_2) is the one place the backbone changes channel width
across the 128-lane boundary: conv1_2 emits 64 channels, conv2_1 wants its
input padded to 128 lanes.  XLA chooses to pad + relu at FULL resolution
(a 255 MB write at B=8 288x416, 1.07 ms) and only then pool (0.37 ms),
i.e. the pad is hoisted above the 4x reduction.  Two XLA-level attacks
failed (PERF_NOTES items 35/36: zero-channel conv widening,
optimization_barrier).  This kernel forces the cheap order by fusing the
whole boundary into one opaque pass:

    out[b, i, j, c] = relu(max of the 2x2 window)   for c <  C_in
    out[b, i, j, c] = 0                              for c >= C_in

reading the PRE-ReLU conv output once (relu commutes with max) and writing
the pooled tensor directly in the 128-channel shape conv2_1 consumes — the
full-resolution pad never exists.  ~320 MB of traffic instead of ~830 MB.

**Outcome: NEGATIVE RESULT, default OFF (PERF_NOTES item 42).**  The
kernel is exact on hardware (bitwise vs the reference composition) and
near its own roofline, but the full predict step REGRESSED 17.4 -> 18.5 ms
at B=8 288x416: pallas_call only accepts default-layout operands, and XLA
keeps the stage-1 activations in (C, B, W, H)-minor layouts — the in-situ
profile shows three relayout copies (0.70 + 0.43 + 0.49 ms) inserted
around the kernel, more than the 1.4 ms pad+pool pair it deletes.  Kept
in-tree (gate ``WESUP_FUSED_POOL1=1``) as the documented third attack on
this boundary, after items 35 (zero-channel widening) and 36
(optimization_barrier).  Mosaic lowering lessons learned on the way are
recorded in the kernel body comments and CLAUDE.md.

The consumer conv's weight is zero-padded to the widened input channel
count at trace time (a few KB, exact: the extra input channels are zero, so
the MXU accumulates exact zeros — the hardware pads 64 -> 128 internally
either way, so no extra real work is done).

Gradient: the custom VJP replays the reference composition
(relu -> reduce_window max -> channel pad) through jax.vjp, so training
gradients are bit-identical to the XLA path this kernel replaces — the
forward values are equal (a max of the same numbers), hence so is
select_and_scatter's routing.  Only the forward's memory traffic changes.

Mosaic notes: the H-pair max splits the block's major dim (free reshape);
the W-pair max is a stride-2 slice pair on the sublane dim; the channel
pad happens in-VMEM on the lane dim (64 -> 128 stays within one native
lane register, which the input already pays for).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_relu_pool_pad", "supports", "reference"]


def reference(pre: jnp.ndarray, out_channels: int) -> jnp.ndarray:
    """The exact composition the kernel replaces (also the VJP's replay)."""
    x = jax.nn.relu(pre)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    c = pre.shape[-1]
    if out_channels > c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, out_channels - c)))
    return x


def supports(shape, rows: int = 8, out_channels: int | None = None) -> bool:
    """Whether the kernel handles this input shape.

    Needs even H/W, an output-row count divisible by the block rows,
    sublane-aligned output width, and — because the kernel folds the
    W-pair into the lane dim — an output channel count of exactly twice
    the input's (the 64 -> 128 stage-1 boundary; every 32-aligned loader
    canvas satisfies the spatial constraints).
    """
    if len(shape) != 4:
        return False
    _, H, W, C = shape
    if out_channels is not None and out_channels != 2 * C:
        return False
    return (H % (2 * rows) == 0 and W % 2 == 0
            and (W // 2) % 8 == 0 and W >= 32 and 2 * C <= 256)


def _kernel(x_ref, o_ref, *, cin: int):
    # x lanes hold a W-pair: [x[2q] c0..c{cin-1} | x[2q+1] c0..c{cin-1}]
    x = x_ref[0]                                    # (2r, W/2, 2*cin)
    r = x.shape[0] // 2
    xr = x.reshape(r, 2, x.shape[1], x.shape[2])    # major-dim split (free)
    a = jnp.maximum(xr[:, 0], xr[:, 1])             # H-pair max
    a = jnp.maximum(a, jnp.zeros((), x.dtype))      # relu (commutes with max)
    # W-pair max entirely in lanes: roll the partner half down, take max,
    # zero the upper half with a select-as-multiply.  No gathers, slices
    # or pads — stride-2 sublane slicing is NOT lowerable by Mosaic
    # ("Only 2D gather is supported", and the 2D form hits a gather shape
    # check), which killed two earlier formulations of this kernel.
    # shift=+cin over a period of 2*cin: rolled[l] = a[(l + cin) % 2cin]
    # (pltpu.roll rejects negative shifts, and v5e Mosaic rejects rotates
    # of 16-bit data — "Rotate with non-32-bit data" — so the roll runs on
    # an f32 upcast; max of upcast bf16 values is exact either way)
    a32 = a.astype(jnp.float32) if a.dtype.itemsize < 4 else a
    m = jnp.maximum(a32, pltpu.roll(a32, shift=cin, axis=2))
    lane = jax.lax.broadcasted_iota(jnp.int32, m.shape, 2)
    o_ref[0] = (m * (lane < cin).astype(m.dtype)).astype(o_ref.dtype)


def _impl(pre: jnp.ndarray, cout: int, rows: int) -> jnp.ndarray:
    B, H, W, C = pre.shape
    nhb = (H // 2) // rows
    # merge each W-pair into the lane dim OUTSIDE the kernel: a row-major
    # view (free bitcast under the default layout), so the block arrives
    # born in its final lane structure
    x2 = pre.reshape(B, H, W // 2, 2 * C)
    return pl.pallas_call(
        functools.partial(_kernel, cin=C),
        grid=(B, nhb),
        in_specs=[pl.BlockSpec((1, 2 * rows, W // 2, 2 * C),
                               lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows, W // 2, cout),
                               lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W // 2, cout), pre.dtype),
        interpret=os.environ.get("WESUP_PALLAS_INTERPRET", "0") == "1",
    )(x2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _fused(pre, cout, rows):
    return _impl(pre, cout, rows)


def _fused_fwd(pre, cout, rows):
    return _impl(pre, cout, rows), pre


def _fused_bwd(cout, rows, pre, g):
    # replay the reference composition: select_and_scatter routes the
    # cotangent exactly as the XLA path this kernel replaced would
    _, vjp = jax.vjp(lambda p: reference(p, cout), pre)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_relu_pool_pad(pre: jnp.ndarray, out_channels: int,
                        rows: int = 8) -> jnp.ndarray:
    """relu -> 2x2/2 maxpool -> zero-pad channels to ``out_channels``.

    ``pre`` is a (B, H, W, C) PRE-activation conv output; returns
    (B, H/2, W/2, out_channels) with channels C: zeroed.  Falls back to
    the XLA composition when :func:`supports` rejects the shape, and for
    any dtype wider than 32 bits (f64/c64/i64 — Mosaic has no 64-bit
    types; caught on hardware by the round-4 axon suite run).
    """
    if pre.dtype.itemsize > 4:
        # Mosaic has no 64-bit types ("NotImplementedError: 64-bit types
        # are not supported" at trace time on hardware); the x64 parity
        # harness in tests/test_pool_pallas.py reaches here via f64.
        return reference(pre, out_channels)
    if not supports(pre.shape, rows, int(out_channels)):
        return reference(pre, out_channels)
    return _fused(pre, int(out_channels), rows)
