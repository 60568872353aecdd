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

CLAHE (p=0.5 in the reference) is applied host-side in the dataset layer via
cv2 — see data/datasets.py.  Exact albumentations bit-parity is impossible
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
         fill: float = 0.0) -> jnp.ndarray:
    """Inverse-warp (H, W, C) or (H, W) by the forward affine A (xy coords)."""
    H, W = img.shape[:2]
    Ainv = jnp.linalg.inv(A)
    yy = jnp.arange(H, dtype=jnp.float32)
    xx = jnp.arange(W, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
    src_x = Ainv[0, 0] * gx + Ainv[0, 1] * gy + Ainv[0, 2]
    src_y = Ainv[1, 0] * gx + Ainv[1, 1] * gy + Ainv[1, 2]

    def sample_channel(ch):
        return jax.scipy.ndimage.map_coordinates(
            ch, [src_y, src_x], order=order, mode="constant", cval=fill)

    if img.ndim == 2:
        return sample_channel(img)
    return jnp.stack([sample_channel(img[..., c])
                      for c in range(img.shape[-1])], axis=-1)


def transform_points(points_xy: jnp.ndarray, A: jnp.ndarray) -> jnp.ndarray:
    """Forward-transform (P, 2) xy point coordinates by A."""
    ones = jnp.ones((points_xy.shape[0], 1), points_xy.dtype)
    hom = jnp.concatenate([points_xy, ones], axis=-1)
    out = hom @ A[:2].T
    return out


def random_elastic(key: jax.Array, img: jnp.ndarray, mask: jnp.ndarray | None,
                   alpha: float = 34.0, grid: int = 8):
    """Coarse-field elastic deformation (bilinear for img, nearest for mask)."""
    H, W = img.shape[:2]
    k1, k2 = jax.random.split(key)
    coarse = jax.random.normal(k1, (grid, grid, 2)) * alpha / max(H, W) * min(H, W)
    disp = resize_bilinear(coarse, (H, W), align_corners=False)
    yy = jnp.arange(H, dtype=jnp.float32)[:, None] + disp[..., 0]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :] + disp[..., 1]

    def sample(ch, order):
        return jax.scipy.ndimage.map_coordinates(ch, [yy, xx], order=order,
                                                 mode="nearest")

    out_img = jnp.stack([sample(img[..., c], 1) for c in range(img.shape[-1])],
                        axis=-1)
    out_mask = None if mask is None else sample(mask, 0)
    return out_img, out_mask
