"""Pallas stage-0 cell-window pooling vs the dense one-hot reference."""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

from wesup_tpu.ops import cellgrid  # noqa: E402
from wesup_tpu.ops.cellpool_pallas import cell_pool0, supports  # noqa: E402
from wesup_tpu.ops.slic import make_plan, slic  # noqa: E402


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    if jax.default_backend() != "tpu":
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


def _slic_batch(B, H, W, sp_area, seed=0):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
    valid = np.ones((B, H, W), bool)
    valid[:, -5:] = False
    valid[:, :, -7:] = False
    valid = jnp.asarray(valid)
    seg = jax.vmap(lambda i, v: slic(i, v, sp_area=sp_area))(img, valid)
    return seg, valid


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_cell_pool0_matches_one_hot(dtype):
    B, H, W, sp_area = 2, 64, 160, 200
    plan = make_plan(H, W, sp_area)
    assert supports(plan)
    K = plan.n_clusters
    seg, valid = _slic_batch(B, H, W, sp_area)
    rng = np.random.default_rng(1)
    taps = jnp.asarray(rng.standard_normal((B, H, W, 24)), dtype)

    seg_m = jnp.where(valid, seg, -1)
    got = np.asarray(cell_pool0(plan, seg_m, taps))

    oh = (np.asarray(seg)[..., None] == np.arange(K)) & np.asarray(
        valid)[..., None]
    want = np.einsum("bhwk,bhwc->bkc", oh.astype(np.float64),
                     np.asarray(taps, np.float64))

    tol = 1e-5 if dtype == jnp.float32 else 0.02
    np.testing.assert_allclose(got, want, atol=tol * np.abs(want).max() + 1e-6)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_cell_pool0_grad_matches_one_hot(dtype):
    B, H, W, sp_area = 1, 64, 160, 150
    plan = make_plan(H, W, sp_area)
    K = plan.n_clusters
    seg, valid = _slic_batch(B, H, W, sp_area, seed=3)
    seg_m = jnp.where(valid, seg, -1)
    rng = np.random.default_rng(4)
    taps = jnp.asarray(rng.standard_normal((B, H, W, 16)), dtype)
    w = jnp.asarray(rng.standard_normal((K,)), jnp.float32)

    def f_kernel(t):
        return jnp.sum(cell_pool0(plan, seg_m, t)[..., 0] * w)

    def f_ref(t):
        # the XLA path's backward: one-hot matmul of the f32 cotangent,
        # cast to taps' dtype — both sides are pure selections, so the
        # grads must agree exactly in EITHER dtype
        oh = (seg_m[..., None] == jnp.arange(K, dtype=seg.dtype)
              ).astype(jnp.float32)
        sums = jnp.einsum("bhwk,bhwc->bkc", oh, t.astype(jnp.float32))
        return jnp.sum(sums[..., 0] * w)

    g_kernel = jax.grad(f_kernel)(taps)
    g_ref = jax.grad(f_ref)(taps)
    assert g_kernel.dtype == dtype
    np.testing.assert_allclose(np.asarray(g_kernel, np.float32),
                               np.asarray(g_ref, np.float32),
                               atol=1e-5, rtol=1e-5)


def test_cell_pool0_rejects_ragged_rows():
    plan = make_plan(60, 160, 200)  # 60 % 8 != 0
    assert not supports(plan)
    with pytest.raises(ValueError):
        cell_pool0(plan, jnp.zeros((1, 60, 160), jnp.int32),
                   jnp.zeros((1, 60, 160, 8), jnp.float32))


def _dense_stage_sums(spp, e9, taps, K):
    Md = cellgrid.stage_adjoint_weights(spp, e9)
    B = taps.shape[0]
    return jnp.einsum("bpyqx,bpqc->byxc", Md, taps,
                      preferred_element_type=jnp.float32
                      ).reshape(B, K, taps.shape[-1])


@pytest.mark.parametrize("hs_ws", [(32, 80), (30, 77)])  # even and ragged
def test_cell_pool_stage_matches_dense(hs_ws):
    from wesup_tpu.ops.cellpool_pallas import cell_pool_stage, supports_stage

    B, H, W, sp_area = 2, 64, 160, 200
    Hs, Ws = hs_ws
    plan = make_plan(H, W, sp_area)
    K = plan.n_clusters
    seg, valid = _slic_batch(B, H, W, sp_area, seed=7)
    e9 = cellgrid.offset_masks(plan, seg, valid, jnp.float32)
    spp = cellgrid.make_stage_pool_plan(plan, Hs, Ws, True)
    assert supports_stage(plan, spp)
    rng = np.random.default_rng(8)
    taps = jnp.asarray(rng.standard_normal((B, Hs, Ws, 24)), jnp.float32)

    got = np.asarray(cell_pool_stage(plan, spp, e9, taps))
    want = np.asarray(_dense_stage_sums(spp, e9, taps, K))
    np.testing.assert_allclose(got, want,
                               atol=1e-4 * max(1.0, np.abs(want).max()))


def test_cell_pool_stage_grad_matches_dense():
    from wesup_tpu.ops.cellpool_pallas import cell_pool_stage

    B, H, W, sp_area = 1, 64, 160, 150
    Hs, Ws = 32, 80
    plan = make_plan(H, W, sp_area)
    K = plan.n_clusters
    seg, valid = _slic_batch(B, H, W, sp_area, seed=9)
    e9 = cellgrid.offset_masks(plan, seg, valid, jnp.float32)
    spp = cellgrid.make_stage_pool_plan(plan, Hs, Ws, True)
    rng = np.random.default_rng(10)
    taps = jnp.asarray(rng.standard_normal((B, Hs, Ws, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K,)), jnp.float32)

    g_kernel = jax.grad(lambda t: jnp.sum(
        cell_pool_stage(plan, spp, e9, t)[..., 0] * w))(taps)
    g_ref = jax.grad(lambda t: jnp.sum(
        _dense_stage_sums(spp, e9, t, K)[..., 0] * w))(taps)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-4)
