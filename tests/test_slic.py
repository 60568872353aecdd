"""SLIC on-device clustering: coverage, locality, oracle accuracy."""

import jax
import jax.numpy as jnp
import numpy as np

from wesup_tpu.ops.slic import make_plan, n_clusters, slic


def _synthetic_blobs(H, W, seed=0):
    """Piecewise-constant color image + binary mask of the bright class."""
    rng = np.random.default_rng(seed)
    img = np.zeros((H, W, 3), np.float32)
    mask = np.zeros((H, W), np.int32)
    yy, xx = np.mgrid[0:H, 0:W]
    for _ in range(6):
        cy, cx = rng.integers(0, H), rng.integers(0, W)
        r = rng.integers(min(H, W) // 8, min(H, W) // 4)
        blob = (yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2
        img[blob] = [0.8, 0.2, 0.3]
        mask[blob] = 1
    img[mask == 0] = [0.9, 0.85, 0.9]
    img += rng.normal(0, 0.01, img.shape).astype(np.float32)
    return np.clip(img, 0, 1), mask


def test_plan_shapes():
    plan = make_plan(100, 140, 200)
    assert plan.Kh == round(100 / np.sqrt(200))
    assert plan.Kw == round(140 / np.sqrt(200))
    assert n_clusters(100, 140, 200) == plan.Kh * plan.Kw


def test_slic_covers_and_is_local():
    img, _ = _synthetic_blobs(96, 128)
    seg = np.asarray(slic(jnp.asarray(img), sp_area=200, n_iters=10))
    K = n_clusters(96, 128, 200)
    assert seg.min() >= 0 and seg.max() < K
    # most clusters should be non-empty
    assert len(np.unique(seg)) > 0.7 * K
    # locality: each cluster's pixel spread should be bounded by ~3 cells
    plan = make_plan(96, 128, 200)
    for k in np.unique(seg):
        ys, xs = np.where(seg == k)
        assert np.ptp(ys) <= 3.5 * plan.step_y
        assert np.ptp(xs) <= 3.5 * plan.step_x


def test_slic_oracle_accuracy():
    """Superpixel majority vote against the mask should be near-perfect on
    synthetic blobs (the reference's acceptance probe,
    scripts/search_slic_params.py:30-38)."""
    img, mask = _synthetic_blobs(128, 160, seed=3)
    seg = np.asarray(slic(jnp.asarray(img), sp_area=200, compactness=40.0))
    oracle = np.zeros_like(mask)
    for k in np.unique(seg):
        m = seg == k
        oracle[m] = int(round(mask[m].mean()))
    acc = (oracle == mask).mean()
    assert acc > 0.95, acc


def test_slic_valid_mask_keeps_assignment_shape():
    img, _ = _synthetic_blobs(64, 96)
    valid = np.zeros((64, 96), bool)
    valid[:48, :64] = True
    seg = np.asarray(slic(jnp.asarray(img), jnp.asarray(valid), sp_area=100))
    assert seg.shape == (64, 96)
    assert seg.min() >= 0


def test_slic_jittable_and_deterministic():
    img, _ = _synthetic_blobs(64, 64)
    f = jax.jit(lambda x: slic(x, sp_area=150, n_iters=5))
    s1 = np.asarray(f(jnp.asarray(img)))
    s2 = np.asarray(f(jnp.asarray(img)))
    np.testing.assert_array_equal(s1, s2)
