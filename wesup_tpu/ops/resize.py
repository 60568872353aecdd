"""Bilinear/nearest resizes with exact PyTorch `F.interpolate` semantics.

The reference upsamples every side-conv output back to image resolution with
``F.interpolate(..., mode='bilinear', align_corners=True)``
(models/wesup.py:254-255) and resizes inference inputs with
``align_corners=False`` bilinear / nearest (infer.py:74-75).  JAX's
``jax.image.resize`` only implements the half-pixel (align_corners=False)
convention, so we build the interpolation as *separable matrix products*:

    out = A_h @ img @ A_w^T        (per channel)

This is mathematically exact, and it is also the fast formulation on TPU: the
banded interpolation matrices ride the MXU instead of generating gather ops.
The matrices are built at trace time from static shapes (everything under jit
has static shapes, so this is free).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense (out_size, in_size) 1-D linear interpolation matrix."""
    A = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        A[:, 0] = 1.0
        return A
    if align_corners:
        if out_size == 1:
            # torch samples position 0 when out==1 with align_corners=True
            A[0, 0] = 1.0
            return A
        pos = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        pos = (np.arange(out_size) + 0.5) * scale - 0.5
        pos = np.clip(pos, 0.0, in_size - 1)
    lo = np.floor(pos).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 2)
    frac = pos - lo
    A[np.arange(out_size), lo] = 1.0 - frac
    A[np.arange(out_size), lo + 1] = frac
    return A


@functools.lru_cache(maxsize=None)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """Index map matching torch F.interpolate(mode='nearest')."""
    # torch 'nearest' uses floor(out_idx * in/out)
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
    return np.clip(idx, 0, in_size - 1)


def resize_bilinear(img: jnp.ndarray, out_hw, align_corners: bool = True,
                    dtype=None) -> jnp.ndarray:
    """Bilinear resize of a (..., H, W, C) array to (..., H', W', C).

    Exact parity with ``torch.nn.functional.interpolate(mode='bilinear')``
    for both align_corners conventions (verified in tests/test_resize.py).
    """

    H, W = img.shape[-3], img.shape[-2]
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    if (H, W) == (out_h, out_w):
        return img if dtype is None else img.astype(dtype)
    cdtype = dtype or img.dtype
    A_h = jnp.asarray(_interp_matrix(H, out_h, align_corners), dtype=cdtype)
    A_w = jnp.asarray(_interp_matrix(W, out_w, align_corners), dtype=cdtype)
    x = img.astype(cdtype)
    # Keep channel-last layout and contract W FIRST: x[b, h] is a contiguous
    # (w, c) matrix, so A_w @ x is a clean batched matmul, and the following
    # H contraction then reduces the (h, p*c)-major dim — also contiguous.
    # (H-first ordering makes the W pass contract a middle dim at full
    # height: profiled 26 ms/step vs ~4 ms for this ordering on v5e.)
    if x.ndim == 3:
        if out_w != W:
            x = jnp.einsum("pw,hwc->hpc", A_w, x)
        if out_h != H:
            x = jnp.einsum("oh,hpc->opc", A_h, x)
        return x
    if x.ndim == 4:
        if out_w != W:
            x = jnp.einsum("pw,bhwc->bhpc", A_w, x)
        if out_h != H:
            x = jnp.einsum("oh,bhpc->bopc", A_h, x)
        return x
    raise ValueError(f"unsupported rank {x.ndim}")


def resize_w_only(img: jnp.ndarray, out_w: int,
                  align_corners: bool = True) -> jnp.ndarray:
    """Resize only the W axis of (B, H, W, C) (the cheap first pass)."""
    W = img.shape[-2]
    if W == int(out_w):
        return img
    A_w = jnp.asarray(_interp_matrix(W, int(out_w), align_corners),
                      dtype=img.dtype)
    return jnp.einsum("pw,bhwc->bhpc", A_w, img)


def fused_upsample_sum(stage_maps, out_h: int,
                       align_corners: bool = True) -> jnp.ndarray:
    """Sum of H-upsampled maps as ONE contraction.

    Given W-resized maps [(B, Hs_i, W, C)], computes
    sum_i resize_H(map_i, out_h) with a single einsum against the
    column-concatenated interpolation matrices — exact, and it writes ONE
    full-resolution output instead of one per stage plus a sum pass
    (profiled: the separate H-passes + sum were ~16 ms/step of pure HBM).
    """
    dt = stage_maps[0].dtype
    A_cat = np.concatenate(
        [_interp_matrix(int(m.shape[1]), int(out_h), align_corners)
         for m in stage_maps], axis=1)
    cat = jnp.concatenate(stage_maps, axis=1)
    return jnp.einsum("oh,bhpc->bopc", jnp.asarray(A_cat, dtype=dt), cat)


def resize_nearest(img: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Nearest resize of (..., H, W, C) matching torch semantics."""
    H, W = img.shape[-3], img.shape[-2]
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    if (H, W) == (out_h, out_w):
        return img
    iy = jnp.asarray(_nearest_index(H, out_h))
    ix = jnp.asarray(_nearest_index(W, out_w))
    return img[..., iy[:, None], ix[None, :], :]
