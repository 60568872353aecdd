"""Cell-grid pooling/painting vs the one-hot reference forms (exactness).

ops/cellgrid.py computes segment counts/sums/painting from SLIC's
cell+offset structure without the (HW, K) one-hot; these tests pin that the
results are EXACT (not approximately equal) against ops/segments.py, and
that the plan-aware forward_superpixel matches the general path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wesup_tpu.ops import cellgrid
from wesup_tpu.ops.segments import one_hot_assignment, superpixel_stats
from wesup_tpu.ops.slic import make_plan, n_clusters, slic

H, W, SP_AREA = 48, 64, 60


@pytest.fixture(scope="module")
def seg_and_plan():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((H, W, 3), np.float32))
    valid = jnp.asarray(np.pad(np.ones((H - 6, W - 9), bool),
                               ((0, 6), (0, 9))))
    seg = jax.jit(lambda im, v: slic(im, v, sp_area=SP_AREA, n_iters=4))(
        img, valid)
    return np.asarray(seg), np.asarray(valid), make_plan(H, W, SP_AREA)


def test_local_offsets_roundtrip(seg_and_plan):
    """cell + decoded offset reconstructs seg exactly, all offsets in [0,9)."""
    seg, _, plan = seg_and_plan
    o = np.asarray(cellgrid.local_offsets(plan, jnp.asarray(seg)))
    assert o.min() >= 0 and o.max() < 9
    sy = plan.cell_y[:, None] + o // 3 - 1
    sx = plan.cell_x[None, :] + o % 3 - 1
    np.testing.assert_array_equal(sy * plan.Kw + sx, seg)


def test_cell_counts_exact(seg_and_plan):
    seg, valid, plan = seg_and_plan
    K = plan.n_clusters
    want = np.asarray(one_hot_assignment(jnp.asarray(seg), K,
                                         jnp.asarray(valid))).sum(0)
    got = np.asarray(cellgrid.cell_counts(plan, jnp.asarray(seg),
                                          jnp.asarray(valid)))
    np.testing.assert_array_equal(got, want)
    # unmasked variant
    want = np.asarray(one_hot_assignment(jnp.asarray(seg), K)).sum(0)
    got = np.asarray(cellgrid.cell_counts(plan, jnp.asarray(seg)))
    np.testing.assert_array_equal(got, want)


def test_cell_pool_exact_on_integer_data(seg_and_plan):
    seg, valid, plan = seg_and_plan
    K = plan.n_clusters
    rng = np.random.default_rng(1)
    x = rng.integers(0, 2, (H, W, 3)).astype(np.float32)
    oh = one_hot_assignment(jnp.asarray(seg), K, jnp.asarray(valid))
    want = np.asarray(oh.T @ jnp.asarray(x.reshape(-1, 3)))
    got = np.asarray(cellgrid.cell_pool(plan, jnp.asarray(seg),
                                        jnp.asarray(x), jnp.asarray(valid)))
    np.testing.assert_array_equal(got, want)


def test_cell_pool_close_on_float_data(seg_and_plan):
    seg, valid, plan = seg_and_plan
    K = plan.n_clusters
    rng = np.random.default_rng(2)
    x = rng.standard_normal((H, W, 5)).astype(np.float32)
    oh = one_hot_assignment(jnp.asarray(seg), K, jnp.asarray(valid))
    want = np.asarray(oh.T @ jnp.asarray(x.reshape(-1, 5)))
    got = np.asarray(cellgrid.cell_pool(plan, jnp.asarray(seg),
                                        jnp.asarray(x), jnp.asarray(valid)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_cell_paint_exact(seg_and_plan):
    seg, _, plan = seg_and_plan
    K = plan.n_clusters
    rng = np.random.default_rng(3)
    vals = rng.standard_normal((K,)).astype(np.float32)
    got = np.asarray(cellgrid.cell_paint(plan, jnp.asarray(seg),
                                         jnp.asarray(vals)))
    np.testing.assert_array_equal(got, vals[seg])
    # multi-channel
    vals2 = rng.standard_normal((K, 2)).astype(np.float32)
    got2 = np.asarray(cellgrid.cell_paint(plan, jnp.asarray(seg),
                                          jnp.asarray(vals2)))
    np.testing.assert_array_equal(got2, vals2[seg])


def test_cell_paint_exact_bf16(seg_and_plan):
    """0/1 selections copy bf16 values bit-for-bit (the production dtype)."""
    seg, _, plan = seg_and_plan
    rng = np.random.default_rng(4)
    vals = jnp.asarray(rng.random((plan.n_clusters,)), jnp.bfloat16)
    got = cellgrid.cell_paint(plan, jnp.asarray(seg), vals)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(vals, np.float32)[seg])


def test_superpixel_stats_plan_matches(seg_and_plan):
    seg, valid, plan = seg_and_plan
    K = plan.n_clusters
    rng = np.random.default_rng(5)
    mask = (rng.random((H, W, 2)) < 0.01).astype(np.float32)
    a = superpixel_stats(jnp.asarray(seg), K, jnp.asarray(mask),
                         jnp.asarray(valid))
    b = superpixel_stats(jnp.asarray(seg), K, jnp.asarray(mask),
                         jnp.asarray(valid), plan=plan)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # no-supervision variant
    a = superpixel_stats(jnp.asarray(seg), K, None, jnp.asarray(valid))
    b = superpixel_stats(jnp.asarray(seg), K, None, jnp.asarray(valid),
                         plan=plan)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_forward_superpixel_plan_matches():
    """Plan path == general path on the full forward (f32, CPU-exact)."""
    from wesup_tpu.models import wesup

    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.random((1, H, W, 3), np.float32))
    valid = jnp.asarray(np.pad(np.ones((1, H - 6, W - 9), bool),
                               ((0, 0), (0, 6), (0, 9))))
    seg = jax.vmap(lambda im, v: slic(im, v, sp_area=SP_AREA, n_iters=4))(
        img, valid)
    K = n_clusters(H, W, SP_AREA)
    plan = make_plan(H, W, SP_AREA)
    params = wesup.init_params(jax.random.PRNGKey(0))

    a = jax.jit(lambda p: wesup.forward_superpixel(p, img, seg, K, valid))(
        params)
    b = jax.jit(lambda p: wesup.forward_superpixel(p, img, seg, K, valid,
                                                   plan=plan))(params)
    np.testing.assert_allclose(np.asarray(a.sp_pred), np.asarray(b.sp_pred),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.sp_features),
                               np.asarray(b.sp_features), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.pred), np.asarray(b.pred),
                               atol=1e-6)


def test_stage_adjoint_weights_match_dense(seg_and_plan):
    """Local windowed route == A_h^T OH A_w computed densely (f32)."""
    from wesup_tpu.ops.cellgrid import (make_stage_pool_plan, offset_masks,
                                        stage_adjoint_weights)
    from wesup_tpu.ops.resize import _interp_matrix

    seg, valid, plan = seg_and_plan
    K = plan.n_clusters
    seg_b = jnp.asarray(seg)[None]
    valid_b = jnp.asarray(valid)[None]
    oh = (seg_b[..., None] == jnp.arange(K)).astype(jnp.float32)
    oh = oh * valid_b[..., None]
    for Hs, Ws in ((H // 2, W // 2), (H // 8, W // 8), (3, 4)):
        A_h = jnp.asarray(_interp_matrix(Hs, H, True))    # (H, Hs)
        A_w = jnp.asarray(_interp_matrix(Ws, W, True))
        want = jnp.einsum("hp,bhwk->bpwk", A_h, oh)
        want = jnp.einsum("wq,bpwk->bpqk", A_w, want)     # (1, Hs, Ws, K)
        e9 = offset_masks(plan, seg_b, valid_b, jnp.float32)
        spp = make_stage_pool_plan(plan, Hs, Ws, True)
        got = stage_adjoint_weights(spp, e9)              # (1,Hs,Kh,Ws,Kw)
        got = jnp.transpose(got, (0, 1, 3, 2, 4)).reshape(1, Hs, Ws, K)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


def test_forward_superpixel_local_matches_adjoint():
    from wesup_tpu.models import wesup

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((1, H, W, 3), np.float32))
    valid = jnp.asarray(np.pad(np.ones((1, H - 6, W - 9), bool),
                               ((0, 0), (0, 6), (0, 9))))
    seg = jax.vmap(lambda im, v: slic(im, v, sp_area=SP_AREA, n_iters=4))(
        img, valid)
    K = n_clusters(H, W, SP_AREA)
    plan = make_plan(H, W, SP_AREA)
    params = wesup.init_params(jax.random.PRNGKey(1))

    a = jax.jit(lambda p: wesup.forward_superpixel(p, img, seg, K, valid,
                                                   plan=plan))(params)
    b = jax.jit(lambda p: wesup.forward_superpixel(p, img, seg, K, valid,
                                                   pooling="local",
                                                   plan=plan))(params)
    np.testing.assert_allclose(np.asarray(a.sp_pred), np.asarray(b.sp_pred),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(a.sp_features),
                               np.asarray(b.sp_features), atol=2e-4)
    np.testing.assert_allclose(np.asarray(a.pred), np.asarray(b.pred),
                               atol=2e-5)


def test_train_step_local_pooling_matches_adjoint():
    """3 jitted train steps: pooling='local' == 'adjoint' (metrics + params)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    import __graft_entry__ as graft
    from wesup_tpu.config import WESUPConfig
    from wesup_tpu.models import steps, wesup

    Ht, Wt = 64, 64
    batch = {k: jnp.asarray(v) for k, v in graft._tiny_batch(2, Ht, Wt).items()}
    results = {}
    for pooling in ("adjoint", "local"):
        cfg = WESUPConfig(slic_iters=2, sp_area=100, compute_dtype="float32",
                          pooling=pooling)
        params = wesup.init_params(jax.random.PRNGKey(0))
        tx = steps.make_optimizer(cfg)
        opt = tx.init(params)
        acc = steps.init_metric_acc()
        step = steps.make_train_step(cfg, (Ht, Wt), point_mode=True, tx=tx)
        for i in range(3):
            params, opt, acc = step(params, opt, acc, batch,
                                    jax.random.PRNGKey(i))
        results[pooling] = (params, {k: float(v)
                                     for k, v in acc["sums"].items()})
    pa, ma = results["adjoint"]
    pl, ml = results["local"]
    for k in ma:
        np.testing.assert_allclose(ml[k], ma[k], rtol=1e-4, atol=1e-5,
                                   err_msg=k)
    for la, ll in zip(jax.tree.leaves(pa), jax.tree.leaves(pl)):
        np.testing.assert_allclose(np.asarray(ll), np.asarray(la),
                                   rtol=1e-4, atol=1e-5)
