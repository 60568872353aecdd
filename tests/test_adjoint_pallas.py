"""Pallas fused adjoint pooling vs the dense reference math."""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

from wesup_tpu.ops.adjoint_pallas import adjoint_pool_stage  # noqa: E402
from wesup_tpu.ops.resize import _interp_matrix  # noqa: E402


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    if jax.default_backend() != "tpu":
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_adjoint_pool_stage_matches_dense(dtype):
    B, H, W, K = 2, 32, 48, 37
    Hs, Ws, C = 16, 24, 12
    rng = np.random.default_rng(0)
    seg = rng.integers(0, K, (B, H, W)).astype(np.int32)
    seg[0, :2] = -1  # invalid pixels contribute nothing
    taps = rng.standard_normal((B, Hs, Ws, C)).astype(np.float32)
    A_h = _interp_matrix(Hs, H, True)
    A_w = _interp_matrix(Ws, W, True)

    oh = (seg[..., None] == np.arange(K)).astype(np.float64)
    M = np.einsum("wv,buwk->buvk", A_w,
                  np.einsum("hu,bhwk->buwk", A_h, oh))
    want = np.einsum("buvk,buvc->bck", M, taps.astype(np.float64))

    tapsH_T = np.einsum("hu,buvc->bchv", A_h, taps)
    got = np.asarray(adjoint_pool_stage(
        jnp.asarray(seg), jnp.asarray(tapsH_T, dtype),
        jnp.asarray(A_w.T, dtype), K))

    tol = 5e-5 if dtype == jnp.float32 else 0.15
    np.testing.assert_allclose(got, want, atol=tol * np.abs(want).max(),
                               rtol=0.02 if dtype == jnp.bfloat16 else 1e-5)
