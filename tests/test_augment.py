"""Device-side augmentation: geometric consistency of images vs points."""

import jax
import jax.numpy as jnp
import numpy as np

from wesup_tpu.ops import augment as aug


def test_affine_points_follow_image():
    """A bright dot warped with order=0 must land where the transformed
    point coordinates say it lands."""
    H, W = 64, 64
    img = np.zeros((H, W), np.float32)
    img[20, 30] = 1.0

    for seed in range(6):
        A = aug.random_affine(jax.random.PRNGKey(seed), (H, W))
        warped = np.asarray(aug.warp(jnp.asarray(img), A, order=0))
        pt = np.asarray(aug.transform_points(
            jnp.asarray([[30.0, 20.0]]), A))[0]  # xy order
        x, y = int(round(float(pt[0]))), int(round(float(pt[1])))
        ys, xs = np.where(warped > 0.5)
        if len(ys) == 0:
            # dot warped out of frame -> point must be out of bounds too
            assert not (0 <= x < W and 0 <= y < H), (pt, seed)
            continue
        # nearest-resampled dot may shift by a pixel vs the exact coord
        d = np.min(np.abs(ys - y) + np.abs(xs - x))
        assert d <= 1.5, (seed, pt, list(zip(ys, xs)))


def test_identity_affine_is_noop():
    cfg = aug.PositionConfig(hflip_p=0.0, vflip_p=0.0, ssr_p=0.0)
    A = aug.random_affine(jax.random.PRNGKey(0), (16, 16), cfg)
    np.testing.assert_allclose(np.asarray(A), np.eye(3), atol=1e-6)
    img = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
    out = np.asarray(aug.warp(jnp.asarray(img), A, order=1))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_hflip_only():
    cfg = aug.PositionConfig(hflip_p=1.0, vflip_p=0.0, ssr_p=0.0)
    A = aug.random_affine(jax.random.PRNGKey(0), (8, 10), cfg)
    img = np.arange(80, dtype=np.float32).reshape(8, 10)
    out = np.asarray(aug.warp(jnp.asarray(img), A, order=0))
    np.testing.assert_allclose(out, img[:, ::-1], atol=1e-5)


def test_shear_overflow_degrades_to_fill():
    """Rows whose per-row shift exceeds the static headroom must produce
    ZERO output (-> fill via the caller's coverage channel), never
    wrongly-shifted content with coverage still 1 (ADVICE r2 medium)."""
    H, W = 16, 32
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((H, W, 2)).astype(np.float32) + 1.0)

    # per-row shifts: rows 0..H-2 inside headroom, last row far beyond it
    R = 8
    offs_np = np.linspace(0.0, float(R) - 1.0, H).astype(np.float32)
    offs_np[-1] = 3.0 * R  # overflow
    out = np.asarray(aug._shear(img, 1.0, jnp.asarray(offs_np), 1,
                                axis=1, range_max=R))

    # in-range rows match a direct per-row resample (interior columns; edge
    # columns carry partial band coverage by design — fill is the caller's
    # coverage channel's job)
    for r in (0, H // 3, H - 2):
        pos = np.arange(W, dtype=np.float32) + offs_np[r]
        interior = pos <= W - 2
        k = np.floor(pos[interior]).astype(int)
        f = (pos[interior] - k)[:, None]
        vals = np.asarray(img[r])
        exp = (1 - f) * vals[k] + f * vals[k + 1]
        np.testing.assert_allclose(out[r][interior], exp, atol=1e-5,
                                   err_msg=str(r))
        np.testing.assert_allclose(out[r][pos >= W], 0.0, atol=1e-6)

    # the overflowing row is fully zeroed (graceful fill), not clip-shifted
    np.testing.assert_allclose(out[-1], 0.0, atol=1e-6)


def test_warp_exact_agrees_with_cascade():
    """The exact one-pass warp (ablation reference) and the shift-cascade
    warp agree to the documented one-lerp-composition tolerance on interior
    pixels, and exactly on identity/flips."""
    H, W = 40, 48
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))

    # identity and flip: both exact
    for cfg in (aug.PositionConfig(hflip_p=0.0, vflip_p=0.0, ssr_p=0.0),
                aug.PositionConfig(hflip_p=1.0, vflip_p=0.0, ssr_p=0.0)):
        A = aug.random_affine(jax.random.PRNGKey(0), (H, W), cfg)
        a = np.asarray(aug.warp(img, A, order=1))
        b = np.asarray(aug.warp_exact(img, A, order=1))
        np.testing.assert_allclose(a, b, atol=1e-5)

    # generic rotation+scale+shift: interior pixels within lerp-composition
    # error (smooth random image -> small)
    for seed in range(4):
        A = aug.random_affine(jax.random.PRNGKey(seed), (H, W))
        a = np.asarray(aug.warp(img, A, order=1, fill=0.5))
        b = np.asarray(aug.warp_exact(img, A, order=1, fill=0.5))
        # compare away from fill boundaries (coverage blending differs)
        interior = (np.abs(a - 0.5).max(-1) > 1e-3) & \
                   (np.abs(b - 0.5).max(-1) > 1e-3)
        assert interior.mean() > 0.2, seed
        diff = np.abs(a - b)[interior]
        assert np.median(diff) < 0.08, (seed, np.median(diff))


def test_appearance_stays_in_range_and_changes_image():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
    out = aug.random_appearance(jax.random.PRNGKey(1), img)
    out = np.asarray(out)
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert not np.allclose(out, np.asarray(img))


def test_hsv_roundtrip():
    from wesup_tpu.ops.colorspace import hsv_to_rgb, rgb_to_hsv

    rng = np.random.default_rng(2)
    rgb = jnp.asarray(rng.random((50, 3)).astype(np.float32))
    back = hsv_to_rgb(rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


def test_rgb2lab_matches_known_values():
    from wesup_tpu.ops.colorspace import rgb2lab

    # white -> L=100, a~0, b~0 ; black -> 0,0,0
    lab = np.asarray(rgb2lab(jnp.asarray([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0],
                                          [1.0, 0.0, 0.0]])))
    np.testing.assert_allclose(lab[0], [100.0, 0.0, 0.0], atol=0.1)
    np.testing.assert_allclose(lab[1], [0.0, 0.0, 0.0], atol=0.1)
    # sRGB red in CIELAB (D65): approx (53.24, 80.09, 67.20)
    np.testing.assert_allclose(lab[2], [53.24, 80.09, 67.20], atol=0.5)


def test_elastic_preserves_shapes():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((40, 40, 3)).astype(np.float32))
    mask = jnp.asarray(rng.integers(0, 2, (40, 40)).astype(np.float32))
    out_img, out_mask = aug.random_elastic(jax.random.PRNGKey(0), img, mask)
    assert out_img.shape == img.shape
    assert out_mask.shape == mask.shape
    # nearest-resampled mask stays binary
    assert set(np.unique(np.asarray(out_mask))).issubset({0.0, 1.0})


def test_rgb2lab_matches_cv2():
    """cv2 LAB (8-bit scaled) vs ours: L in [0,100] maps to cv2's [0,255]."""
    import cv2

    from wesup_tpu.ops.colorspace import rgb2lab

    rng = np.random.default_rng(3)
    rgb_u8 = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    ours = np.asarray(rgb2lab(jnp.asarray(rgb_u8.astype(np.float32) / 255.0)))
    ref = cv2.cvtColor(rgb_u8, cv2.COLOR_RGB2LAB).astype(np.float32)
    np.testing.assert_allclose(ours[..., 0], ref[..., 0] * 100.0 / 255.0,
                               atol=1.0)
    np.testing.assert_allclose(ours[..., 1], ref[..., 1] - 128.0, atol=1.5)
    np.testing.assert_allclose(ours[..., 2], ref[..., 2] - 128.0, atol=1.5)
