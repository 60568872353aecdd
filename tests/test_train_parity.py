"""End-to-end training-trajectory parity vs a torch replica.

Strongest training-correctness evidence: with identical weights, superpixel
assignments, labels and SGD hyperparameters, the per-step loss sequence of
our jitted train path must track a torch reimplementation of the reference
(forward + semi-CE + propagation + SGD(momentum, wd)) step for step.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

sys.path.insert(0, str(Path(__file__).parent))

from test_loss import _torch_propagate, _torch_semi_ce  # noqa: E402
from test_model import _TorchWESUP, _copy_weights_to_torch  # noqa: E402

from wesup_tpu.models import wesup  # noqa: E402
from wesup_tpu.models.objectives import wesup_loss  # noqa: E402
from wesup_tpu.ops.segments import one_hot_assignment, superpixel_stats  # noqa: E402


def test_sgd_trajectory_matches_torch():
    rng = np.random.default_rng(0)
    H, W, K, C = 32, 32, 8, 2
    img = rng.random((1, H, W, 3)).astype(np.float32)
    seg = rng.integers(0, K, (1, H, W)).astype(np.int32)

    # sparse supervision: 3 labeled superpixels
    sup = np.zeros((H, W, C), np.float32)
    labeled_sps = [0, 3, 5]
    for k in labeled_sps:
        ys, xs = np.where(seg[0] == k)
        sup[ys[0], xs[0], k % 2] = 1.0

    params = wesup.init_params(jax.random.PRNGKey(1))
    lr, momentum, wd, thr, pw = 1e-3, 0.9, 1e-3, 0.5, 0.5

    # ---- our side -------------------------------------------------------
    tx = optax.chain(optax.add_decayed_weights(wd), optax.trace(momentum),
                     optax.scale(-lr))
    opt = tx.init(params)
    stats = superpixel_stats(jnp.asarray(seg[0]), K, jnp.asarray(sup))

    @jax.jit
    def step(params, opt):
        def lf(p):
            out = wesup.forward_superpixel(p, jnp.asarray(img),
                                           jnp.asarray(seg), K)
            l = wesup_loss(out.sp_pred[0], out.sp_features[0], stats.labels,
                           stats.labeled, stats.real, class_weights=(3, 1),
                           propagate_threshold=thr, propagate_weight=pw)
            return l.loss
        loss, g = jax.value_and_grad(lf)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    ours_losses = []
    p = params
    for _ in range(4):
        p, opt, loss = step(p, opt)
        ours_losses.append(float(loss))

    # ---- torch side -----------------------------------------------------
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
    for _ in range(4):
        opt_t.zero_grad()
        sp_pred, sp_feats = tmodel(xt, sp_maps)
        pred_ord = sp_pred[order]
        feats_ord = sp_feats[order]
        n_l = len(y_l)
        ce = _torch_semi_ce(pred_ord[:n_l], y_l, (3, 1))
        y_u = _torch_propagate(feats_ord.detach(), y_l, thr)
        pce = _torch_semi_ce(pred_ord[n_l:], y_u, (3, 1))
        loss = ce + pw * pce
        loss.backward()
        opt_t.step()
        torch_losses.append(float(loss))

    np.testing.assert_allclose(ours_losses, torch_losses, rtol=2e-3,
                               atol=2e-4)
    # and training actually moves
    assert ours_losses[-1] != ours_losses[0]
