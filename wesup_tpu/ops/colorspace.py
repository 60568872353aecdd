"""Color-space conversions in JAX.

The reference's SLIC call converts RGB to CIELAB internally (skimage's
``slic(...)`` defaults to ``convert2lab=True`` for 3-channel input; see
models/wesup.py:471-476 which passes a float RGB image).  We reproduce the
standard sRGB -> linear RGB -> XYZ(D65) -> CIELAB chain on device so the
whole SLIC pipeline stays inside the jitted step.

Also hosts RGB<->HSV used by the device-side augmentation stack.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# sRGB -> XYZ (D65) matrix, same constants as skimage.color.
# NUMPY, not jnp: module-level jnp constants are committed to the default
# device at import, and capturing a device array as a traced-function
# constant forces a device->host fetch DURING lowering — through this
# box's TPU tunnel that fetch (plus the transfer-path init it triggers)
# measured seconds-to-minutes on a process's first lowering.  numpy
# constants embed directly into the MLIR module.
_RGB2XYZ = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=np.float32,
)

# D65 reference white
_XYZ_REF = np.array([0.95047, 1.0, 1.08883], dtype=np.float32)


def srgb_to_linear(rgb: jnp.ndarray) -> jnp.ndarray:
    rgb = rgb.astype(jnp.float32)
    return jnp.where(
        rgb > 0.04045,
        ((rgb + 0.055) / 1.055) ** 2.4,
        rgb / 12.92,
    )


def rgb2lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """Convert (..., 3) sRGB in [0, 1] to CIELAB (L in [0,100], a/b ~[-128,127])."""
    lin = srgb_to_linear(rgb)
    xyz = lin @ _RGB2XYZ.T
    xyz = xyz / _XYZ_REF

    eps = 0.008856451679035631  # (6/29)^3
    kappa = 903.2962962962963  # (29/3)^3
    f = jnp.where(xyz > eps, jnp.cbrt(xyz), (kappa * xyz + 16.0) / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB [0,1] -> HSV with H in [0,1)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h = h % 1.0
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)
