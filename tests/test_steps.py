"""In-step preprocessing: supervision selection, point rasterization."""

import jax
import jax.numpy as jnp
import numpy as np

from wesup_tpu.config import WESUPConfig
from wesup_tpu.models.steps import _preprocess_sample, _rasterize_points


def _inputs(H=32, W=32, P=8):
    img = np.full((H, W, 3), 128, np.uint8)
    valid = np.ones((H, W), bool)
    pixel_mask = np.zeros((H, W), np.int32)
    pixel_mask[10:20, 10:20] = 1
    points = np.zeros((P, 3), np.int32)
    point_valid = np.zeros(P, bool)
    return img, valid, pixel_mask, points, point_valid


def test_rasterize_points_basic():
    points = jnp.asarray([[3, 5, 1], [0, 0, 0], [40, 2, 1]], jnp.int32)
    pv = jnp.asarray([True, True, True])
    mask = np.asarray(_rasterize_points(points, pv, (8, 8), 2))
    assert mask[5, 3, 1] == 1      # (x=3, y=5) class 1
    assert mask[0, 0, 0] == 1
    assert mask.sum() == 2         # out-of-bounds point dropped


def test_rasterize_invalid_points_are_noops():
    points = jnp.asarray([[2, 2, 1]], jnp.int32)
    mask = np.asarray(_rasterize_points(points, jnp.asarray([False]), (8, 8), 2))
    assert mask.sum() == 0


def test_preprocess_eval_uses_pixel_mask():
    cfg = WESUPConfig(slic_iters=2, sp_area=64, compute_dtype="float32")
    img, valid, pixel_mask, points, point_valid = _inputs()
    prep = _preprocess_sample(
        jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(valid),
        jnp.asarray(pixel_mask), jnp.asarray(points), jnp.asarray(point_valid),
        jnp.asarray(False), config=cfg, train=False, point_mode=False)
    sup = np.asarray(prep.sup_mask)
    # supervision equals the pixel one-hot
    np.testing.assert_array_equal(sup[..., 1], (pixel_mask == 1))
    np.testing.assert_array_equal(sup[..., 0], (pixel_mask == 0))
    np.testing.assert_array_equal(np.asarray(prep.target), pixel_mask)


def test_preprocess_points_take_precedence():
    cfg = WESUPConfig(slic_iters=2, sp_area=64, compute_dtype="float32")
    img, valid, pixel_mask, points, point_valid = _inputs()
    points[0] = (15, 15, 1)  # inside the fg square
    points[1] = (2, 2, 0)
    point_valid[:2] = True
    prep = _preprocess_sample(
        jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(valid),
        jnp.asarray(pixel_mask), jnp.asarray(points), jnp.asarray(point_valid),
        jnp.asarray(False), config=cfg, train=False, point_mode=True)
    sup = np.asarray(prep.sup_mask)
    assert sup.sum() == 2  # sparse: only the two points
    assert sup[15, 15, 1] == 1
    assert sup[2, 2, 0] == 1


def test_preprocess_mask_as_points():
    cfg = WESUPConfig(slic_iters=2, sp_area=64, compute_dtype="float32")
    img, valid, pixel_mask, points, point_valid = _inputs()
    prep = _preprocess_sample(
        jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(valid),
        jnp.asarray(pixel_mask), jnp.asarray(points), jnp.asarray(point_valid),
        jnp.asarray(True), config=cfg, train=False, point_mode=True)
    sup = np.asarray(prep.sup_mask)
    # negative-image convention: the full pixel mask is the supervision
    np.testing.assert_array_equal(sup[..., 1], (pixel_mask == 1))


def test_preprocess_train_supervision_survives_augmentation():
    """After random warps, every supervised point must still agree with the
    warped pixel mask class at its location."""
    cfg = WESUPConfig(slic_iters=2, sp_area=64, compute_dtype="float32")
    img, valid, pixel_mask, points, point_valid = _inputs()
    points[0] = (15, 15, 1)
    points[1] = (25, 25, 0)
    point_valid[:2] = True
    hits = checked = 0
    for seed in range(8):
        prep = _preprocess_sample(
            jax.random.PRNGKey(seed), jnp.asarray(img), jnp.asarray(valid),
            jnp.asarray(pixel_mask), jnp.asarray(points),
            jnp.asarray(point_valid), jnp.asarray(False),
            config=cfg, train=True, point_mode=True)
        sup = np.asarray(prep.sup_mask)
        target = np.asarray(prep.target)
        ys, xs, cs = np.where(sup > 0)
        for y, x, c in zip(ys, xs, cs):
            if target[y, x] >= 0:
                checked += 1
                # warped point may sit a pixel off the warped mask edge, but
                # must agree most of the time
                hits += int(target[y, x] == c)
    assert checked > 0
    assert hits / checked > 0.7, (hits, checked)
