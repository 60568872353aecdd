"""Bit-exact cv2 resize ON DEVICE for the training pipeline.

The reference resizes every train image on the host each epoch (the
multiscale draw changes the target size per access, utils/data.py:84-101 +
models/base.py:288-300 DataLoader workers).  On this single-core host that
decode+resize+canvas CPU (~0.2 s/epoch at GlaS-85) time-slices against a
~0.27 s/epoch device program and sets the end-to-end training wall
(PERF_NOTES item 38).  Here the full-resolution decode ships to the device
ONCE per training run (a ~100 MB uint8 cache for GlaS-85) and the per-epoch
resize + canvas build runs INSIDE the jitted train step — while staying
BYTE-IDENTICAL to the host path, so train histories do not move.

cv2's uint8 INTER_LINEAR is fixed-point (hal resize, INTER_RESIZE_COEF_BITS
= 11), so float resize would diverge by +-1 LSB on ~13% of pixels.  The
exact algorithm (verified bit-exact vs cv2 over 120 random shrink cases,
tests/test_train_resize.py):

    scale   = 1 / (n_out / n_in)                  # double, both roundings
    f       = float32((o + 0.5) * scale - 0.5)    # f32 BEFORE floor
    i       = floor(f); frac = f - i              # clamp: i<0 -> (0, frac 0)
                                                  # i>=n-1 -> (n-1, frac 0)
    a0      = rint(f32(1 - frac) * 2048)          # independent roundings
    a1      = rint(f32(frac) * 2048)              # (not 2048 - a0)
    H pass  : t = src[i]*a0 + src[i+1]*a1         # int, <= 2^20
    t     >>= 4
    V pass  : ((b0*t0) >> 16) + ((b1*t1) >> 16)   # per-tap shift!
    out     = (sum + 2) >> 2

and INTER_NEAREST is src[floor(o * scale)] clamped.

TPU mapping (no gathers — CLAUDE.md rule 1): the index/coefficient VECTORS
are built on the host (f64 there; O(H+W) per sample, microseconds) and ship
as ~10 KB of metadata per sample; the device builds banded one-hot matrices
from them by iota comparison and runs three exact matmuls per sample:

  - H pass: one coefficient-banded matmul.  Products are (pixel <= 2^8) x
    (coeff <= 2^11) summed over two taps <= 2^20 — exact in f32 with
    precision=HIGHEST (TPU default f32 is bf16-multipass and NOT exact).
  - V pass: cv2 shifts per tap BEFORE summing, and b*t <= 2^27 exceeds the
    f32 mantissa — so the two taps become two SELECTION matmuls (values
    <= 2^16, exact) and the b-multiply/shift/sum runs elementwise in int32.

Canvas placement (loader.place_on_canvas's edge replication) is free: the
host clamps the output coordinate to the content extent when building the
vectors, so padding columns replicate the last content column exactly.
"""

from __future__ import annotations

import numpy as np

# wire keys carried per sample instead of "image"/"pixel_mask"
META_KEYS = ("img_idx", "rsz_iy", "rsz_iy1", "rsz_b0", "rsz_b1",
             "rsz_ix", "rsz_ix1", "rsz_a0", "rsz_a1", "rsz_ny", "rsz_nx")


# ---------------------------------------------------------------------------
# Host side: cv2-exact index/coefficient vectors
# ---------------------------------------------------------------------------

def _linear_axis(n_out: int, n_in: int, n_canvas: int):
    """cv2 INTER_LINEAR taps for one axis, extended over the static canvas.

    Output positions o >= n_out replicate position n_out-1 (the canvas
    edge-replication).  n_out == 0 (batch-padding blank) yields all-zero
    coefficients so the resized image is exactly 0, matching
    loader._blank_item."""
    if n_out <= 0:
        z = np.zeros((n_canvas,), np.int32)
        return z, z, z, z
    o = np.minimum(np.arange(n_canvas), n_out - 1)
    scale = 1.0 / (np.float64(n_out) / np.float64(n_in))  # cv2's two steps
    f = ((o + 0.5) * scale - 0.5).astype(np.float32)
    i = np.floor(f).astype(np.int64)
    frac = f - i.astype(np.float32)
    frac[i < 0] = 0.0
    i[i < 0] = 0
    sel = i >= n_in - 1
    frac[sel] = 0.0
    i[sel] = n_in - 1
    a0 = np.rint((np.float32(1.0) - frac) * np.float32(2048)).astype(np.int32)
    a1 = np.rint(frac * np.float32(2048)).astype(np.int32)
    i1 = np.minimum(i + 1, n_in - 1)
    return i.astype(np.int32), i1.astype(np.int32), a0, a1


def _nearest_axis(n_out: int, n_in: int, n_canvas: int):
    """cv2 INTER_NEAREST source index per output position, canvas-extended."""
    if n_out <= 0:
        return np.zeros((n_canvas,), np.int32)
    o = np.minimum(np.arange(n_canvas), n_out - 1)
    scale = 1.0 / (np.float64(n_out) / np.float64(n_in))
    i = np.floor(o * scale).astype(np.int64)
    return np.clip(i, 0, n_in - 1).astype(np.int32)


def resize_vectors(full_hw, target_hw, canvas_hw) -> dict:
    """All per-sample resize metadata (host, numpy; ~10 KB per sample)."""
    h0, w0 = int(full_hw[0]), int(full_hw[1])
    th, tw = int(target_hw[0]), int(target_hw[1])
    Hc, Wc = int(canvas_hw[0]), int(canvas_hw[1])
    iy, iy1, b0, b1 = _linear_axis(th, h0, Hc)
    ix, ix1, a0, a1 = _linear_axis(tw, w0, Wc)
    return {
        "rsz_iy": iy, "rsz_iy1": iy1, "rsz_b0": b0, "rsz_b1": b1,
        "rsz_ix": ix, "rsz_ix1": ix1, "rsz_a0": a0, "rsz_a1": a1,
        "rsz_ny": _nearest_axis(th, h0, Hc),
        "rsz_nx": _nearest_axis(tw, w0, Wc),
    }


def build_cache(dataset, max_bytes: int | None = None):
    """Stack the dataset's full-resolution images/masks for the device.

    Returns ``{"imgs": (N, H0, W0, 3) uint8, "masks": (N, H0, W0) int8}``
    as HOST numpy (the trainer device_puts once, replicated) or ``None``
    when the device path cannot serve this dataset losslessly: no masks,
    mask values outside int8, or cache above ``max_bytes``.
    """
    n = len(dataset)
    if n == 0 or getattr(dataset, "contour", False):
        return None
    items = []
    h0 = w0 = 0
    for i in range(n):
        full = dataset.full_res_item(i)
        if full is None or full["pixel_mask"] is None:
            return None
        m = full["pixel_mask"]
        if m.min() < -128 or m.max() > 127:
            return None
        items.append(full)
        h0 = max(h0, full["image"].shape[0])
        w0 = max(w0, full["image"].shape[1])
    total = n * h0 * w0 * 4
    if max_bytes is not None and total > max_bytes:
        return None
    imgs = np.zeros((n, h0, w0, 3), np.uint8)
    masks = np.zeros((n, h0, w0), np.int8)
    for i, full in enumerate(items):
        hi, wi = full["image"].shape[:2]
        imgs[i, :hi, :wi] = full["image"]
        masks[i, :hi, :wi] = full["pixel_mask"].astype(np.int8)
    return {"imgs": imgs, "masks": masks}


# ---------------------------------------------------------------------------
# Device side: exact resize from cache + metadata (one sample; vmap outside)
# ---------------------------------------------------------------------------

def apply_resize(cache: dict, batch: dict):
    """(B, Hc, Wc, 3) uint8 image + (B, Hc, Wc) int32 mask from metadata.

    Bit-exact to ``cv2.resize`` (INTER_LINEAR / INTER_NEAREST) followed by
    ``loader.place_on_canvas`` — the three matmuls run at
    precision=HIGHEST, every intermediate stays within the f32 mantissa,
    and cv2's per-tap fixed-point shifts run elementwise in int32."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    imgs, masks = cache["imgs"], cache["masks"]
    n_in_h, n_in_w = imgs.shape[1], imgs.shape[2]
    hi = jax.lax.Precision.HIGHEST

    def one(idx, iy, iy1, b0, b1, ix, ix1, a0, a1, ny, nx, content_hw):
        src = lax.dynamic_index_in_dim(imgs, idx, 0, keepdims=False)
        msk = lax.dynamic_index_in_dim(masks, idx, 0, keepdims=False)
        iota_w = jnp.arange(n_in_w, dtype=jnp.int32)
        iota_h = jnp.arange(n_in_h, dtype=jnp.int32)

        # H pass: coefficient-banded matmul, exact (products <= 2^19)
        A = ((iota_w[None, :] == ix[:, None]) * a0[:, None]
             + (iota_w[None, :] == ix1[:, None]) * a1[:, None]
             ).astype(jnp.float32)                      # (Wc, W0)
        t = jnp.einsum("hwc,Ow->hOc", src.astype(jnp.float32), A,
                       precision=hi)                    # (H0, Wc, 3) <= 2^20
        t = jnp.floor(t * (1.0 / 16.0))                 # cv2's >> 4, exact

        # V pass: two SELECTION matmuls (exact, values <= 2^16), then cv2's
        # per-tap (b * t) >> 16 in int32 (b*t <= 2^27 overflows f32)
        S0 = (iota_h[None, :] == iy[:, None]).astype(jnp.float32)   # (Hc, H0)
        S1 = (iota_h[None, :] == iy1[:, None]).astype(jnp.float32)
        t0 = jnp.einsum("oh,hOc->oOc", S0, t, precision=hi).astype(jnp.int32)
        t1 = jnp.einsum("oh,hOc->oOc", S1, t, precision=hi).astype(jnp.int32)
        r = ((b0[:, None, None] * t0) >> 16) + ((b1[:, None, None] * t1) >> 16)
        img = ((r + 2) >> 2).astype(jnp.uint8)          # (Hc, Wc, 3)

        # mask: nearest = two selection matmuls; -1 fill outside content
        N_h = (iota_h[None, :] == ny[:, None]).astype(jnp.float32)  # (Hc, H0)
        N_w = (iota_w[None, :] == nx[:, None]).astype(jnp.float32)  # (Wc, W0)
        rows = jnp.einsum("oh,hw->ow", N_h, msk.astype(jnp.float32),
                          precision=hi)
        m = jnp.einsum("ow,Ow->oO", rows, N_w, precision=hi).astype(jnp.int32)
        th, tw = content_hw[0], content_hw[1]
        inside = ((jnp.arange(img.shape[0])[:, None] < th)
                  & (jnp.arange(img.shape[1])[None, :] < tw))
        m = jnp.where(inside, m, -1)
        return img, m

    return jax.vmap(one)(
        batch["img_idx"], batch["rsz_iy"], batch["rsz_iy1"],
        batch["rsz_b0"], batch["rsz_b1"], batch["rsz_ix"], batch["rsz_ix1"],
        batch["rsz_a0"], batch["rsz_a1"], batch["rsz_ny"], batch["rsz_nx"],
        batch["content_hw"])
