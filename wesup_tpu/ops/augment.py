"""Device-side data augmentation.

The reference augments on the host with albumentations inside DataLoader
workers (utils/data.py:116-133, 302-327, 432-457).  This environment ships no
albumentations, and host augmentation would bottleneck a TPU on a single CPU
core anyway — so the whole stack runs *inside the jitted train step* with JAX
PRNG keys:

- appearance: HueSaturationValue, RandomBrightnessContrast, Blur
  (albumentations-default ranges on the uint8 scale);
- positional: HorizontalFlip / VerticalFlip / ShiftScaleRotate as one fused
  affine warp; point annotations are transformed as *coordinates* with the
  same matrix (the keypoint semantics of utils/data.py:315-327), never
  resampled, so single-pixel points are preserved exactly;
- elastic: coarse random displacement field, bilinearly upsampled
  (SegmentationDataset path only, utils/data.py:125).

CLAHE (p=0.5 in the reference) also runs on device (ops/clahe.py), in the
reference's transform order.  Exact albumentations bit-parity is impossible
without the library; parity target is statistical (final Dice within 0.5%,
SURVEY.md §7 "Hard parts" item 5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .resize import resize_bilinear


class AppearanceConfig(NamedTuple):
    # albumentations HueSaturationValue limits, uint8 scale
    hue_shift_limit: float = 20.0
    sat_shift_limit: float = 30.0
    val_shift_limit: float = 20.0
    # RandomBrightnessContrast limits
    brightness_limit: float = 0.3
    contrast_limit: float = 0.3
    clahe_p: float = 0.5
    blur_p: float = 0.5


class PositionConfig(NamedTuple):
    hflip_p: float = 0.5
    vflip_p: float = 0.5
    ssr_p: float = 1.0
    shift_limit: float = 0.0625
    scale_limit: float = 0.1
    rotate_limit: float = 45.0  # degrees


def random_appearance(key: jax.Array, img: jnp.ndarray,
                      cfg: AppearanceConfig = AppearanceConfig()) -> jnp.ndarray:
    """Apply HSV shift + brightness/contrast + optional 3x3 blur to (H, W, 3)."""
    from .clahe import clahe_rgb
    from .colorspace import hsv_to_rgb, rgb_to_hsv

    k_h, k_s, k_v, k_b, k_c, k_clahe, k_blur = jax.random.split(key, 7)

    hsv = rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    # cv2 uint8 hue spans 0..180 for the full circle
    dh = jax.random.uniform(k_h, (), minval=-cfg.hue_shift_limit,
                            maxval=cfg.hue_shift_limit) / 180.0
    ds = jax.random.uniform(k_s, (), minval=-cfg.sat_shift_limit,
                            maxval=cfg.sat_shift_limit) / 255.0
    dv = jax.random.uniform(k_v, (), minval=-cfg.val_shift_limit,
                            maxval=cfg.val_shift_limit) / 255.0
    hsv = jnp.stack([
        (hsv[..., 0] + dh) % 1.0,
        jnp.clip(hsv[..., 1] + ds, 0.0, 1.0),
        jnp.clip(hsv[..., 2] + dv, 0.0, 1.0),
    ], axis=-1)
    img = hsv_to_rgb(hsv)

    # brightness/contrast: out = img * (1 + c) + b  (brightness_by_max=True)
    c = jax.random.uniform(k_c, (), minval=-cfg.contrast_limit,
                           maxval=cfg.contrast_limit)
    b = jax.random.uniform(k_b, (), minval=-cfg.brightness_limit,
                           maxval=cfg.brightness_limit)
    img = jnp.clip(img * (1.0 + c) + b, 0.0, 1.0)

    # CLAHE with probability clahe_p (reference order: after
    # brightness/contrast, before blur — utils/data.py:119-130)
    if cfg.clahe_p > 0:
        do_clahe = jax.random.bernoulli(k_clahe, cfg.clahe_p)
        img = jnp.where(do_clahe, clahe_rgb(img), img)

    # 3x3 box blur with probability blur_p
    blurred = _box_blur3(img)
    do_blur = jax.random.bernoulli(k_blur, cfg.blur_p)
    return jnp.where(do_blur, blurred, img)


def _box_blur3(img: jnp.ndarray) -> jnp.ndarray:
    pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    out = jnp.zeros_like(img)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            out = out + pad[dy:dy + img.shape[0], dx:dx + img.shape[1]]
    return out / 9.0


def random_affine(key: jax.Array, hw,
                  cfg: PositionConfig = PositionConfig()) -> jnp.ndarray:
    """Sample a forward 3x3 affine matrix (dst <- A @ src, xy homogeneous).

    Composes HorizontalFlip(p), VerticalFlip(p) and ShiftScaleRotate(p)
    about the image center, matching the reference's position transformer
    (utils/data.py:315-319).
    """
    H, W = hw
    k_h, k_v, k_p, k_ang, k_sc, k_sx, k_sy = jax.random.split(key, 7)

    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0

    hflip = jax.random.bernoulli(k_h, cfg.hflip_p)
    vflip = jax.random.bernoulli(k_v, cfg.vflip_p)
    do_ssr = jax.random.bernoulli(k_p, cfg.ssr_p)

    ang = jnp.deg2rad(jax.random.uniform(
        k_ang, (), minval=-cfg.rotate_limit, maxval=cfg.rotate_limit))
    scale = 1.0 + jax.random.uniform(
        k_sc, (), minval=-cfg.scale_limit, maxval=cfg.scale_limit)
    tx = jax.random.uniform(k_sx, (), minval=-cfg.shift_limit,
                            maxval=cfg.shift_limit) * W
    ty = jax.random.uniform(k_sy, (), minval=-cfg.shift_limit,
                            maxval=cfg.shift_limit) * H
    ang = jnp.where(do_ssr, ang, 0.0)
    scale = jnp.where(do_ssr, scale, 1.0)
    tx = jnp.where(do_ssr, tx, 0.0)
    ty = jnp.where(do_ssr, ty, 0.0)

    fx = jnp.where(hflip, -1.0, 1.0)
    fy = jnp.where(vflip, -1.0, 1.0)

    cos, sin = jnp.cos(ang) * scale, jnp.sin(ang) * scale
    # about-center composition: translate(-c) -> flip -> rotate/scale ->
    # translate(c) -> shift
    a00 = cos * fx
    a01 = -sin * fy
    a10 = sin * fx
    a11 = cos * fy
    b0 = cx - a00 * cx - a01 * cy + tx
    b1 = cy - a10 * cx - a11 * cy + ty
    return jnp.array([[a00, a01, b0], [a10, a11, b1], [0.0, 0.0, 1.0]])


def warp(img: jnp.ndarray, A: jnp.ndarray, *, order: int,
         fill=0.0) -> jnp.ndarray:
    """Inverse-warp (H, W, C) or (H, W) by the forward affine A (xy coords).

    ``fill`` may be a scalar or a (C,)-vector (per-channel fill) — channels
    sharing one warp share all the resampling work, so callers should stack
    same-order arrays into channels.

    Gather-free, and free of dense per-row weight tensors: map_coordinates
    lowers to TPU gathers (profiled at half the train step), and the earlier
    banded formulation built per-row (H, W_out, W_in) weights — (B, 288,
    416, 416) f32 monsters that profiled at ~57% of the B=8 train step.
    Instead the affine is factored into two axis-aligned shear passes, and
    each shear pos = stride*t + offset(row) splits into
      (1) ONE shared banded stride-resample matrix (L_r, L) per sample
          (iota-built, rides the MXU), and
      (2) a per-row INTEGER shift, applied as a log2(range) binary shift
          cascade of whole-tensor selects (pure elementwise, fusable),
          plus one fractional lerp between adjacent columns.
    Sub-pixel results differ from direct bilinear by the usual shear/lerp
    composition — within the augmentation stack's statistical-parity budget
    (tests assert point/image consistency to ~1 px); axis flips and
    identity remain exact.  The factoring needs |m11| bounded away from 0
    (guaranteed by the reference's +-45° rotation limit; a numeric guard
    covers pathological configs).
    """
    H, W = img.shape[:2]
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img

    Ainv = jnp.linalg.inv(A)
    m00, m01, m02 = Ainv[0, 0], Ainv[0, 1], Ainv[0, 2]
    m10, m11, m12 = Ainv[1, 0], Ainv[1, 1], Ainv[1, 2]

    # factor src = M dst + t into: pass1 (x within rows), pass2 (y within
    # cols): src_y = m10 x + m11 y + m12 handled by pass2 with alpha=m11,
    # beta(x) = m10 x + m12; pass1 then needs src_x expressed at the SOURCE
    # row y': b = m01/m11, a = m00 - b m10, c = m02 - b m12
    m11 = jnp.where(jnp.abs(m11) < 1e-3, jnp.where(m11 < 0, -1e-3, 1e-3), m11)
    b = m01 / m11
    a = m00 - b * m10
    c = m02 - b * m12

    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)

    # an exact-coverage channel travels through both passes so fill can be
    # applied once at the end ((1 - cov) distributes linearly over passes)
    x = jnp.concatenate([x, jnp.ones((H, W, 1), x.dtype)], axis=-1)

    # pass 1: tmp[y, x] = in[y, a*x + (b*y + c)]   (shift range ~ |b|*H <= H
    # for the <=45° limit; 1.2x static headroom)
    tmp = _shear(x, a, b * ys + c, order, axis=1,
                 range_max=int(1.2 * H) + 2)
    # pass 2: out[y, x] = tmp[m11*y + (m10*x + m12), x]
    out = _shear(tmp, m11, m10 * xs + m12, order, axis=0,
                 range_max=int(1.2 * W) + 2)

    cov = out[..., -1:]
    fill = jnp.asarray(fill, x.dtype)
    out = out[..., :-1] + (1.0 - cov) * fill
    return out[..., 0] if squeeze else out


def warp_exact(img: jnp.ndarray, A: jnp.ndarray, *, order: int,
               fill=0.0) -> jnp.ndarray:
    """Exact ONE-PASS inverse bilinear/nearest warp (ablation reference).

    Samples every destination pixel at its true source position with
    jax.scipy.ndimage.map_coordinates — no shear factoring, no extra lerp
    composition.  Lowers to TPU gathers (profiled ~2x the cascade's cost at
    train shapes, PERF_NOTES item 14), so this exists to QUANTIFY the
    cascade's statistical divergence (config.warp_method='exact'), not to
    train fast.
    """
    from jax.scipy.ndimage import map_coordinates

    H, W = img.shape[:2]
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img

    Ainv = jnp.linalg.inv(A)
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] * jnp.ones((1, W), jnp.float32)
    xs = jnp.ones((H, 1), jnp.float32) * jnp.arange(W, dtype=jnp.float32)[None, :]
    sx = Ainv[0, 0] * xs + Ainv[0, 1] * ys + Ainv[0, 2]
    sy = Ainv[1, 0] * xs + Ainv[1, 1] * ys + Ainv[1, 2]
    inb = ((sx >= 0) & (sx <= W - 1) & (sy >= 0) & (sy <= H - 1))

    coords = [jnp.clip(sy, 0, H - 1), jnp.clip(sx, 0, W - 1)]
    out = jnp.stack([
        map_coordinates(x[..., c], coords, order=order)
        for c in range(x.shape[-1])
    ], axis=-1)
    fill = jnp.broadcast_to(jnp.asarray(fill, x.dtype), (x.shape[-1],))
    out = jnp.where(inb[..., None], out, fill)
    return out[..., 0] if squeeze else out


def _shear(img: jnp.ndarray, stride, offs: jnp.ndarray, order: int, *,
           axis: int, range_max: int) -> jnp.ndarray:
    """out[.., t, ..] = img[.., stride*t + offs[r], ..] along ``axis``, where
    ``offs`` varies over the OTHER spatial axis (r).

    Decomposition: r[t'] = img[stride*t' + p0] via one shared banded matrix
    (L + range_max, L), then out[r, t] = r[r, t + s_r] with
    s_r = (offs[r] - p0)/stride >= 0 split into an integer binary-shift
    cascade and one fractional lerp.  p0 is chosen (min or max of offs,
    by stride sign) so every shift is non-negative.
    """
    if axis == 0:  # operate along rows by transposing to the axis=1 layout
        return _shear(img.swapaxes(0, 1), stride, offs, order,
                      axis=1, range_max=range_max).swapaxes(0, 1)

    L = img.shape[1]
    R = range_max
    p0 = jnp.where(stride > 0, offs.min(), offs.max())
    s_raw = (offs - p0) / stride                          # (rows,)
    s = jnp.clip(s_raw, 0.0, float(R))
    # rows whose true shift exceeds the static headroom would alias to
    # wrongly-shifted content with coverage still 1; zero them instead so
    # the caller's coverage channel degrades to fill (graceful, like the
    # old banded path)
    row_ok = ((s_raw >= 0.0) & (s_raw <= float(R)))[:, None, None]

    if order == 0:
        k = jnp.floor(s + 0.5).astype(jnp.int32)
        f = None
    else:
        k = jnp.floor(s).astype(jnp.int32)
        f = (s - k)[:, None, None]

    # shared banded stride-resample: r[t'] = img[stride*t' + p0]
    Lr = L + R + 2
    posr = stride * jnp.arange(Lr, dtype=jnp.float32) + p0
    M = _band_weights(posr, L, order)                     # (Lr, L)
    r = jnp.einsum("xj,hjc->hxc", M, img)                 # (rows, Lr, C)

    # per-row integer shift as a binary cascade of whole-tensor selects
    for i in range((R + 1).bit_length()):
        sh = 1 << i
        shifted = jnp.concatenate(
            [r[:, sh:], jnp.zeros_like(r[:, :sh])], axis=1)
        bit = ((k >> i) & 1).astype(bool)[:, None, None]
        r = jnp.where(bit, shifted, r)

    if order == 0:
        return r[:, :L] * row_ok
    return ((1.0 - f) * r[:, :L] + f * r[:, 1:L + 1]) * row_ok


def _band_weights(pos: jnp.ndarray, size: int, order: int) -> jnp.ndarray:
    """(..., size) interpolation weights for continuous positions ``pos``.

    order=1: triangle (linear) kernel; order=0: nearest one-hot.  Positions
    outside [0, size-1] get all-zero rows (constant fill handled by caller).
    """
    j = jnp.arange(size, dtype=jnp.float32)
    d = pos[..., None] - j
    if order == 0:
        w = (jnp.abs(d) <= 0.5).astype(jnp.float32)
        # ties at .5 resolve to the lower index (round-half-down like
        # map_coordinates' round): keep first matching index only
        w = w * (jnp.cumsum(w, axis=-1) == 1)
    else:
        w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    inb = (pos >= 0) & (pos <= size - 1)
    return w * inb[..., None]


def _resample_x(img: jnp.ndarray, pos: jnp.ndarray, order: int,
                fill: float) -> jnp.ndarray:
    """(H, W, C) -> (H, W, C) with out[y, x] = in[y, pos[y, x]] along x."""
    W = img.shape[1]
    S = _band_weights(pos, W, order)                     # (H, W_out, W_in)
    out = jnp.einsum("hxj,hjc->hxc", S, img)
    cov = S.sum(-1)                                      # 0 outside
    return out + (1.0 - cov[..., None]) * fill


def _resample_y(img: jnp.ndarray, pos: jnp.ndarray, order: int,
                fill: float) -> jnp.ndarray:
    """(H, W, C) -> (H, W, C) with out[y, x] = in[pos[y, x], x] along y."""
    H = img.shape[0]
    S = _band_weights(pos, H, order)                     # (H_out, W, H_in)
    out = jnp.einsum("ywj,jwc->ywc", S, img)
    cov = S.sum(-1)
    return out + (1.0 - cov[..., None]) * fill


def transform_points(points_xy: jnp.ndarray, A: jnp.ndarray) -> jnp.ndarray:
    """Forward-transform (P, 2) xy point coordinates by A."""
    ones = jnp.ones((points_xy.shape[0], 1), points_xy.dtype)
    hom = jnp.concatenate([points_xy, ones], axis=-1)
    out = hom @ A[:2].T
    return out


def random_elastic(key: jax.Array, img: jnp.ndarray, mask: jnp.ndarray | None,
                   alpha: float = 34.0, grid: int = 8):
    """Coarse-field elastic deformation (bilinear for img, nearest for mask).

    Gather-free like :func:`warp`: the displacement field is applied as two
    axis-aligned 1-D resampling passes (the standard separable approximation
    for smooth fields)."""
    H, W = img.shape[:2]
    k1, _ = jax.random.split(key)
    coarse = jax.random.normal(k1, (grid, grid, 2)) * alpha / max(H, W) * min(H, W)
    disp = resize_bilinear(coarse, (H, W), align_corners=False)
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    pos_x = jnp.clip(xs + disp[..., 1], 0.0, W - 1)
    pos_y = jnp.clip(ys + disp[..., 0], 0.0, H - 1)

    def apply(ch_img, order):
        out = _resample_x(ch_img, pos_x, order, 0.0)
        return _resample_y(out, pos_y, order, 0.0)

    out_img = apply(img, 1)
    out_mask = None if mask is None else apply(mask[..., None], 0)[..., 0]
    return out_img, out_mask
