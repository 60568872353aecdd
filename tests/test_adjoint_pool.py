"""Adjoint-resize pooling identity: pool(upsample(z)) == Ñᵀ z."""

import jax.numpy as jnp
import numpy as np

from wesup_tpu.ops.resize import resize_bilinear
from wesup_tpu.ops.segments import (adjoint_pool_weights, one_hot_assignment)


def test_adjoint_pool_matches_upsample_then_pool():
    rng = np.random.default_rng(0)
    H, W, Hs, Ws, K, C = 24, 32, 6, 8, 10, 7
    seg = rng.integers(0, K, (H, W)).astype(np.int32)
    valid = rng.random((H, W)) < 0.9
    z = rng.standard_normal((Hs, Ws, C)).astype(np.float32)

    # reference: upsample to full res, masked segment-SUM
    up = np.asarray(resize_bilinear(jnp.asarray(z), (H, W),
                                    align_corners=True))
    oh = np.asarray(one_hot_assignment(jnp.asarray(seg), K,
                                       jnp.asarray(valid)))
    want = oh.T @ up.reshape(-1, C)

    # adjoint: native-res matmul with scatter-built weights
    nh = np.asarray(adjoint_pool_weights(jnp.asarray(seg), jnp.asarray(valid),
                                         K, (Hs, Ws)))
    got = nh.T @ z.reshape(-1, C)

    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_adjoint_pool_identity_resolution():
    rng = np.random.default_rng(1)
    H, W, K = 8, 8, 5
    seg = rng.integers(0, K, (H, W)).astype(np.int32)
    nh = np.asarray(adjoint_pool_weights(jnp.asarray(seg), None, K, (H, W)))
    oh = np.asarray(one_hot_assignment(jnp.asarray(seg), K))
    np.testing.assert_allclose(nh, oh, atol=1e-6)
