"""Device CLAHE vs cv2 (statistical parity)."""

import cv2
import jax.numpy as jnp
import numpy as np

from wesup_tpu.ops.clahe import clahe_plane, clahe_rgb


def test_clahe_plane_matches_cv2_statistically():
    rng = np.random.default_rng(0)
    # low-contrast image with structure
    base = rng.normal(120, 12, (64, 64))
    yy, xx = np.mgrid[0:64, 0:64]
    base += 25 * ((yy - 32) ** 2 + (xx - 32) ** 2 < 15 ** 2)
    img = np.clip(base, 0, 255).astype(np.uint8)

    ours = np.asarray(clahe_plane(jnp.asarray(img, jnp.float32)))
    ref = cv2.createCLAHE(clipLimit=4.0, tileGridSize=(8, 8)).apply(img)

    corr = np.corrcoef(ours.ravel(), ref.astype(np.float64).ravel())[0, 1]
    assert corr > 0.98, corr
    assert abs(ours.mean() - ref.mean()) < 12
    # contrast enhanced vs input
    assert ours.std() > img.std() * 1.2


def test_clahe_plane_flat_image_stays_flat():
    img = jnp.full((32, 32), 100.0)
    out = np.asarray(clahe_plane(img))
    assert np.ptp(out) < 16  # single-bin histogram maps near-constant


def test_clahe_rgb_preserves_range_and_hue():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((64, 64, 3)).astype(np.float32) * 0.4 + 0.3)
    out = np.asarray(clahe_rgb(img))
    assert out.min() >= 0.0 and out.max() <= 1.0
    # hue preservation: channel ratios unchanged where not clipped
    a = np.asarray(img)
    inner = (out > 0.01) & (out < 0.99)
    sel = inner.all(-1)
    r1 = a[sel][:, 0] / (a[sel][:, 1] + 1e-6)
    r2 = out[sel][:, 0] / (out[sel][:, 1] + 1e-6)
    np.testing.assert_allclose(r1, r2, rtol=0.03)
