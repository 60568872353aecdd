"""Pallas fused segment-sum vs dense reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    if jax.default_backend() != "tpu":
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


def test_segment_sum_matches_dense():
    from wesup_tpu.ops.pooling_pallas import segment_sum_pallas

    rng = np.random.default_rng(0)
    P, C, K = 5000, 70, 37
    seg = rng.integers(0, K, P).astype(np.int32)
    seg[::17] = -1  # invalid pixels
    feat = rng.standard_normal((P, C)).astype(np.float32)

    got = np.asarray(segment_sum_pallas(jnp.asarray(seg), jnp.asarray(feat),
                                        K, block_p=1024, c_tile=128))
    want = np.zeros((K, C), np.float32)
    for k in range(K):
        sel = feat[seg == k]
        if len(sel):
            want[k] = sel.sum(0)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-5)


def test_segment_sum_bf16_inputs():
    from wesup_tpu.ops.pooling_pallas import segment_sum_pallas

    rng = np.random.default_rng(1)
    P, C, K = 3000, 32, 16
    seg = rng.integers(0, K, P).astype(np.int32)
    feat = rng.standard_normal((P, C)).astype(np.float32)

    got = np.asarray(segment_sum_pallas(
        jnp.asarray(seg), jnp.asarray(feat, jnp.bfloat16), K,
        block_p=1024, c_tile=128))
    want = np.zeros((K, C), np.float32)
    for k in range(K):
        sel = feat[seg == k]
        if len(sel):
            want[k] = sel.sum(0)
    np.testing.assert_allclose(got, want, atol=0.5, rtol=0.02)
