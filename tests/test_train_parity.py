"""End-to-end training-trajectory parity vs a torch replica.

Strongest training-correctness evidence: with identical weights, superpixel
assignments, labels and SGD hyperparameters, the per-step loss sequence of
our jitted train path must track a torch reimplementation of the reference
(forward + semi-CE + propagation + SGD(momentum, wd)) step for step.

Two configurations are covered:
  * class_weights=None — the reference's REAL wiring (it binds
    partial(_cross_entropy) weight-free, reference models/wesup.py:434).
  * class_weights=(3, 1) — the opt-in weighted path
    (``apply_class_weights=True``).
Propagation must fire BOTH ways over the trajectory (some candidates
receive pseudo-labels, some stay below threshold) so the threshold branch
is actually exercised, and a second test runs at a realistic canvas
(96x128, K~=60) with bfloat16 compute against the float32 torch replica.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent))

from test_loss import _torch_propagate, _torch_semi_ce  # noqa: E402
from test_model import _TorchWESUP, _copy_weights_to_torch  # noqa: E402

from wesup_tpu.models import wesup  # noqa: E402
from wesup_tpu.models.objectives import wesup_loss  # noqa: E402
from wesup_tpu.ops.segments import one_hot_assignment, superpixel_stats  # noqa: E402


def _split_threshold(img, seg, sup, K):
    """Pick a propagation threshold that splits the candidates at init: with
    He-init features all pairwise similarities cluster near 1.0, so a fixed
    literature-style threshold (0.8/0.95) either always or never fires.  The
    midpoint of the LARGEST GAP between adjacent candidate max-similarities
    guarantees the branch is exercised BOTH ways on the first step while
    sitting as far as possible from every candidate — so backend ulps
    (CPU vs TPU) cannot flip which candidates receive pseudo-labels."""
    params = wesup.init_params(jax.random.PRNGKey(1))
    out = wesup.forward_superpixel(params, jnp.asarray(img),
                                   jnp.asarray(seg), K)
    stats = superpixel_stats(jnp.asarray(seg[0]), K, jnp.asarray(sup))
    f = np.asarray(out.sp_features[0], np.float64)
    lab = np.asarray(stats.labeled)
    d2 = ((f[:, None] - f[None, :]) ** 2).sum(-1)
    max_sim = np.sort(np.exp(-d2)[:, lab].max(1)[~lab])
    gaps = np.diff(max_sim)
    i = int(np.argmax(gaps[1:-1])) + 1 if len(gaps) > 2 else len(gaps) // 2
    return float((max_sim[i] + max_sim[i + 1]) / 2.0)


def _make_problem(rng, H, W, K, n_labeled, C=2):
    img = rng.random((1, H, W, 3)).astype(np.float32)
    seg = rng.integers(0, K, (1, H, W)).astype(np.int32)
    sup = np.zeros((H, W, C), np.float32)
    for i, k in enumerate(rng.choice(K, n_labeled, replace=False)):
        ys, xs = np.where(seg[0] == k)
        sup[ys[0], xs[0], i % C] = 1.0
    return img, seg, sup


def _run_trajectories(img, seg, sup, K, *, n_steps, class_weights, thr, pw,
                      lr=1e-3, momentum=0.9, wd=1e-3,
                      compute_dtype=jnp.float32):
    """Run our jitted SGD trajectory and the torch replica side by side.

    Returns (ours_losses, torch_losses, ours_n_prop_per_step).
    """
    params = wesup.init_params(jax.random.PRNGKey(1))

    # ---- our side -------------------------------------------------------
    tx = optax.chain(optax.add_decayed_weights(wd), optax.trace(momentum),
                     optax.scale(-lr))
    opt = tx.init(params)
    stats = superpixel_stats(jnp.asarray(seg[0]), K, jnp.asarray(sup))

    @jax.jit
    def step(params, opt):
        def lf(p):
            out = wesup.forward_superpixel(p, jnp.asarray(img),
                                           jnp.asarray(seg), K,
                                           compute_dtype=compute_dtype)
            l = wesup_loss(out.sp_pred[0], out.sp_features[0], stats.labels,
                           stats.labeled, stats.real,
                           class_weights=class_weights,
                           propagate_threshold=thr, propagate_weight=pw)
            return l.loss, l.propagated_labels
        (loss, n_prop), g = jax.value_and_grad(lf, has_aux=True)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss, n_prop

    ours_losses, ours_prop = [], []
    p = params
    for _ in range(n_steps):
        p, opt, loss, n_prop = step(p, opt)
        ours_losses.append(float(loss))
        ours_prop.append(float(n_prop))

    # ---- torch side (reference reorder-and-slice semantics) -------------
    tmodel = _TorchWESUP()
    _copy_weights_to_torch(params, tmodel)
    opt_t = torch.optim.SGD(tmodel.parameters(), lr=lr, momentum=momentum,
                            weight_decay=wd)

    oh = np.asarray(one_hot_assignment(jnp.asarray(seg[0]), K))
    sp_maps = torch.from_numpy(
        (oh.T / np.maximum(oh.sum(0)[:, None], 1.0)).astype(np.float32))
    xt = torch.from_numpy(img).permute(0, 3, 1, 2)

    labeled = np.asarray(stats.labeled)
    order = np.concatenate([np.where(labeled)[0], np.where(~labeled)[0]])
    y_l = torch.from_numpy(np.asarray(stats.labels)[labeled])

    torch_losses = []
    for _ in range(n_steps):
        opt_t.zero_grad()
        sp_pred, sp_feats = tmodel(xt, sp_maps)
        pred_ord = sp_pred[order]
        feats_ord = sp_feats[order]
        n_l = len(y_l)
        ce = _torch_semi_ce(pred_ord[:n_l], y_l, class_weights)
        y_u = _torch_propagate(feats_ord.detach(), y_l, thr)
        pce = _torch_semi_ce(pred_ord[n_l:], y_u, class_weights)
        loss = ce + pw * pce
        loss.backward()
        opt_t.step()
        torch_losses.append(float(loss))

    return ours_losses, torch_losses, ours_prop


@pytest.mark.parametrize("class_weights", [None, (3, 1)],
                         ids=["unweighted-reference-wiring", "weighted-optin"])
def test_sgd_trajectory_matches_torch(class_weights):
    if jax.default_backend() != "cpu":
        # The largest-gap threshold (see _split_threshold) makes step 1
        # backend-proof, but the guarantee decays as features move: by step
        # 3 a candidate drifts into the fixed threshold and TPU-vs-torch-CPU
        # ulps flip the discrete propagation branch (measured: step-3 loss
        # 0.69 vs 1.04).  Strict 20-step f32 parity is a CPU-only claim;
        # TPU propagation coverage comes from
        # test_propagation_fires_both_ways_at_production_threshold (margin-
        # calibrated, runs on TPU) and the bf16 trajectory test below.
        pytest.skip("fixed-threshold branch amplifies cross-backend ulps")
    rng = np.random.default_rng(0)
    H, W, K = 32, 32, 8
    img, seg, sup = _make_problem(rng, H, W, K, n_labeled=3)
    thr = _split_threshold(img, seg, sup, K)

    ours, want, n_prop = _run_trajectories(
        img, seg, sup, K, n_steps=20, class_weights=class_weights,
        thr=thr, pw=0.5)

    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-4)
    # training actually moves
    assert ours[-1] != ours[0]
    # the propagation threshold is exercised BOTH ways at init (thr is the
    # median candidate similarity): some of the 5 candidates receive a
    # pseudo-label, some stay below threshold
    assert 0 < n_prop[0] < 5, f"threshold not split at init: {n_prop[0]}"
    assert max(n_prop) > 0


def test_propagation_fires_both_ways_at_production_threshold():
    """The production threshold 0.8 (reference models/wesup.py:165,514) must
    be exercised BOTH ways by TRAINED features in the real jitted step.

    He-init features cluster at similarity ~1.0 and the training dynamics of
    this tiny problem are chaotic (straddle windows open and close with
    backend fp noise), so waiting for the raw trajectory to straddle 0.8 is
    flaky.  Instead: train in-fixture (lr >> reference so the feature
    GEOMETRY spreads in seconds at tiny shapes), then apply one exact
    positive-homogeneous calibration — fc3 is linear+relu, so scaling its
    weight AND bias by s scales every feature by exactly s — with s chosen
    to land the threshold in the LARGEST RATIO GAP of the candidates'
    min-distances-to-labeled.  The margin this buys (sims end up ~0.1-0.4
    away from 0.8 on both sides) makes the branch decision backend-proof:
    runs on CPU AND TPU, no skip.
    """
    import optax

    rng = np.random.default_rng(5)
    H, W, K = 32, 32, 8
    img, seg, sup = _make_problem(rng, H, W, K, n_labeled=3)
    thr, pw, lr = 0.8, 0.5, 5e-3

    params = wesup.init_params(jax.random.PRNGKey(1))
    tx = optax.chain(optax.add_decayed_weights(1e-3), optax.trace(0.9),
                     optax.scale(-lr))
    opt = tx.init(params)
    stats = superpixel_stats(jnp.asarray(seg[0]), K, jnp.asarray(sup))
    lab = np.asarray(stats.labeled)
    cand = ~lab & np.asarray(stats.real)

    @jax.jit
    def step(params, opt):
        def lf(p):
            out = wesup.forward_superpixel(p, jnp.asarray(img),
                                           jnp.asarray(seg), K)
            l = wesup_loss(out.sp_pred[0], out.sp_features[0], stats.labels,
                           stats.labeled, stats.real, class_weights=None,
                           propagate_threshold=thr, propagate_weight=pw)
            return l.loss, l.propagated_labels
        (_, n_prop), g = jax.value_and_grad(lf, has_aux=True)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, n_prop

    def candidate_sims(params):
        out = wesup.forward_superpixel(params, jnp.asarray(img),
                                       jnp.asarray(seg), K)
        f = np.asarray(out.sp_features[0], np.float64)
        d2 = ((f[:, None] - f[None, :]) ** 2).sum(-1)
        return np.exp(-d2)[:, lab].max(1)[cand]

    margin, sims = 0.05, None
    for _ in range(8):  # up to 400 tiny steps; 200 suffice in practice
        for _ in range(50):
            params, opt, _ = step(params, opt)
        # calibrate: put -ln(thr) at the geometric mean of the largest
        # adjacent RATIO gap in candidate min-distances
        dmin = np.sort(-np.log(np.maximum(candidate_sims(params), 1e-300)))
        ratios = dmin[1:] / np.maximum(dmin[:-1], 1e-30)
        i = int(np.argmax(ratios))
        s2 = -np.log(thr) / np.sqrt(dmin[i] * dmin[i + 1])
        scale = jnp.asarray(np.sqrt(s2), jnp.float32)
        scaled = dict(params,
                      fc3={k: v * scale for k, v in params["fc3"].items()})
        sims = candidate_sims(scaled)
        if (sims > thr + margin).any() and (sims < thr - margin).any() \
                and not ((np.abs(sims - thr) < margin).any()):
            break
    else:
        pytest.fail(f"calibrated sims never split {thr}+-{margin}: {sims}")

    # the jitted step's propagation count (computed on the calibrated
    # params) agrees with the host-side count: the 0.8 branch fired both
    # ways inside the real train step
    expect = int((sims > thr).sum())
    assert 0 < expect < len(sims), sims
    _, _, n_prop = step(scaled, opt)
    assert int(n_prop) == expect, (int(n_prop), expect, sims)


def test_sgd_trajectory_realistic_size_bf16():
    """96x128 canvas, K~=60 (sp_area=200 scale), bfloat16 compute vs the
    float32 torch replica — catches bf16 accumulation drift at production
    compute dtype and realistic superpixel counts."""
    rng = np.random.default_rng(3)
    H, W, K = 96, 128, 60
    img, seg, sup = _make_problem(rng, H, W, K, n_labeled=12)

    ours, want, n_prop = _run_trajectories(
        img, seg, sup, K, n_steps=6, class_weights=None, thr=0.5, pw=0.5,
        compute_dtype=jnp.bfloat16)

    # bf16 matmuls vs f32 torch: loose per-step tolerance, but the
    # trajectory must track (no compounding divergence)
    np.testing.assert_allclose(ours, want, rtol=5e-2, atol=5e-3)
    assert ours[-1] != ours[0]
