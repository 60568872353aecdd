"""Superpixel label vote + segment mean vs independent numpy implementations."""

import jax.numpy as jnp
import numpy as np

from wesup_tpu.ops.segments import (one_hot_assignment, paint, segment_mean,
                                    superpixel_stats)


def test_superpixel_stats_vote_and_masks():
    seg = jnp.asarray([[0, 0, 1], [2, 2, 1]], dtype=jnp.int32)
    # class-1 point on a pixel of sp0; tie on sp1 (one px class0, one class1)
    mask = np.zeros((2, 3, 2), np.float32)
    mask[0, 0, 1] = 1  # sp0 -> class 1
    mask[0, 2, 0] = 1  # sp1 px 1 -> class 0
    mask[1, 2, 1] = 1  # sp1 px 2 -> class 1
    stats = superpixel_stats(seg, 4, jnp.asarray(mask))

    np.testing.assert_array_equal(np.asarray(stats.labeled), [True, True, False, False])
    np.testing.assert_array_equal(np.asarray(stats.real), [True, True, True, False])
    # sp0: one-hot class 1; sp1: tie -> multi-hot (reference quantization
    # (sums == max) yields ones on ties, models/wesup.py:51-52)
    np.testing.assert_array_equal(np.asarray(stats.labels[0]), [0, 1])
    np.testing.assert_array_equal(np.asarray(stats.labels[1]), [1, 1])
    np.testing.assert_array_equal(np.asarray(stats.labels[2]), [0, 0])


def test_superpixel_stats_respects_valid():
    seg = jnp.asarray([[0, 1]], dtype=jnp.int32)
    valid = jnp.asarray([[True, False]])
    mask = np.zeros((1, 2, 2), np.float32)
    mask[0, 1, 1] = 1  # annotation only on the INVALID pixel
    stats = superpixel_stats(seg, 2, jnp.asarray(mask), valid)
    assert not bool(stats.labeled[1])
    assert not bool(stats.real[1])


def test_segment_mean_matches_numpy():
    rng = np.random.default_rng(0)
    H, W, C, K = 10, 12, 7, 9
    seg = rng.integers(0, K, (H, W)).astype(np.int32)
    feat = rng.standard_normal((H * W, C)).astype(np.float32)

    oh = one_hot_assignment(jnp.asarray(seg), K)
    counts = np.asarray(oh).sum(0)
    got = np.asarray(segment_mean(jnp.asarray(feat), oh, jnp.asarray(counts)))

    want = np.zeros((K, C), np.float32)
    flat = seg.reshape(-1)
    for k in range(K):
        sel = feat[flat == k]
        if len(sel):
            want[k] = sel.mean(0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_paint_gathers():
    seg = jnp.asarray([[0, 1], [2, 1]], dtype=jnp.int32)
    vals = jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_array_equal(np.asarray(paint(seg, vals)),
                                  [[1.0, 2.0], [3.0, 2.0]])
