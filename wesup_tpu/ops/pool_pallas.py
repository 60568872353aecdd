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


def supports(shape, rows: int = 8) -> bool:
    """Whether the kernel handles this input shape.

    Needs even H/W, an output-row count divisible by the block rows, and
    sublane-aligned output width (bf16 tiles are (16, 128); every
    32-aligned loader canvas satisfies all of this).
    """
    if len(shape) != 4:
        return False
    _, H, W, _ = shape
    return (H % (2 * rows) == 0 and W % 2 == 0
            and (W // 2) % 8 == 0 and W >= 32)


def _kernel(x_ref, o_ref, *, cin: int, cout: int):
    x = x_ref[0]                                    # (2r, W, cin)
    r = x.shape[0] // 2
    xr = x.reshape(r, 2, x.shape[1], cin)           # major-dim split (free)
    a = jnp.maximum(xr[:, 0], xr[:, 1])             # H-pair max
    a = jnp.maximum(a, jnp.zeros((), x.dtype))      # relu (commutes with max)
    m = jnp.maximum(a[:, 0::2, :], a[:, 1::2, :])   # W-pair max (sublanes)
    if cout > cin:
        m = jnp.pad(m, ((0, 0), (0, 0), (0, cout - cin)))
    o_ref[0] = m


def _impl(pre: jnp.ndarray, cout: int, rows: int) -> jnp.ndarray:
    B, H, W, C = pre.shape
    nhb = (H // 2) // rows
    return pl.pallas_call(
        functools.partial(_kernel, cin=C, cout=cout),
        grid=(B, nhb),
        in_specs=[pl.BlockSpec((1, 2 * rows, W, C),
                               lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows, W // 2, cout),
                               lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W // 2, cout), pre.dtype),
        interpret=os.environ.get("WESUP_PALLAS_INTERPRET", "0") == "1",
    )(pre)


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
    the XLA composition when :func:`supports` rejects the shape.
    """
    if not supports(pre.shape, rows):
        return reference(pre, out_channels)
    return _fused(pre, int(out_channels), rows)
