"""CLAHE (contrast-limited adaptive histogram equalization) on device.

The reference applies albumentations CLAHE with p=0.5 inside its appearance
transform chain (utils/data.py:124, 310, 439: clip_limit 4.0, 8x8 tile grid,
on the L channel of LAB).  A host cv2 implementation would both bottleneck
the single-core host and break the reference's transform ORDER (CLAHE sits
between brightness/contrast and blur); this implements the algorithm in JAX
so the whole chain stays in the jitted step.

Gather-free formulation: the per-pixel 256-bin one-hot is built once; tile
histograms are two constant binning matmuls over it; the per-pixel LUT is the
bilinear interpolation of the 8x8 tile LUTs (our resize op), and the final
lookup is an elementwise one-hot contraction instead of a gather.

Divergence from cv2 (statistical parity, like the rest of the augmentation
stack): clipped histogram excess is redistributed uniformly (cv2 also spreads
a residual over leading bins), and tile interpolation uses half-pixel
bilinear instead of cv2's tile-center clamped lerp.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .colorspace import rgb2lab
from .resize import resize_bilinear

_BINS = 256


@functools.lru_cache(maxsize=None)
def _tile_binning(size: int, tiles: int) -> np.ndarray:
    """(tiles, size) 0/1 matrix assigning each row/col to its tile."""
    idx = np.minimum((np.arange(size) * tiles) // size, tiles - 1)
    B = np.zeros((tiles, size), np.float32)
    B[idx, np.arange(size)] = 1.0
    return B


def clahe_plane(x: jnp.ndarray, clip_limit: float = 4.0,
                tiles: int = 8) -> jnp.ndarray:
    """CLAHE on a (H, W) plane of uint8-valued floats in [0, 255]."""
    H, W = x.shape
    v = jnp.clip(jnp.round(x), 0, 255).astype(jnp.int32)
    onehot = (v[..., None] == jnp.arange(_BINS, dtype=jnp.int32)
              ).astype(jnp.float32)  # (H, W, 256)

    Bh = jnp.asarray(_tile_binning(H, tiles))
    Bw = jnp.asarray(_tile_binning(W, tiles))
    hist = jnp.einsum("th,hwb->twb", Bh, onehot)
    hist = jnp.einsum("sw,twb->tsb", Bw, hist)  # (tiles, tiles, 256)

    tile_area = (Bh.sum(1)[:, None, None] * Bw.sum(1)[None, :, None])
    limit = jnp.maximum(1.0, clip_limit * tile_area / _BINS)
    clipped = jnp.minimum(hist, limit)
    excess = (hist - clipped).sum(-1, keepdims=True)
    clipped = clipped + excess / _BINS

    cdf = jnp.cumsum(clipped, axis=-1)
    lut = jnp.clip(jnp.round(cdf * (255.0 / tile_area)), 0, 255)

    # per-pixel LUT by bilinear interpolation of the tile LUTs, then the
    # value lookup as an elementwise one-hot contraction (no gathers)
    lut_pix = resize_bilinear(lut, (H, W), align_corners=False)
    return jnp.einsum("hwb,hwb->hw", onehot, lut_pix)


def clahe_rgb(img: jnp.ndarray, clip_limit: float = 4.0,
              tiles: int = 8) -> jnp.ndarray:
    """CLAHE on the L channel of LAB for a (H, W, 3) RGB image in [0, 1].

    Matches albumentations' color handling (LAB L-channel equalization);
    the LAB->RGB return trip is approximated by scaling RGB with the
    luminance ratio, which preserves hue exactly and is within the
    statistical-parity budget of the augmentation stack.
    """
    lab = rgb2lab(jnp.clip(img, 0.0, 1.0))
    L = lab[..., 0] * (255.0 / 100.0)
    L_eq = clahe_plane(L, clip_limit, tiles) * (100.0 / 255.0)
    ratio = (L_eq + 1e-6) / (lab[..., 0] + 1e-6)
    return jnp.clip(img * ratio[..., None], 0.0, 1.0)
