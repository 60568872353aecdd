"""Loss parity: masked formulation vs a literal reimplementation of the
reference's reorder-and-slice semantics (in torch, written from the spec)."""

import jax.numpy as jnp
import numpy as np
import torch

from wesup_tpu.models.objectives import (label_propagate, semi_cross_entropy,
                                         wesup_loss)


def _torch_semi_ce(y_hat, y_true, class_weights=None, epsilon=1e-7):
    """Reference _cross_entropy math (models/wesup.py:66-96), independent impl."""
    y_hat = torch.clamp(y_hat, min=epsilon, max=1 - epsilon)
    labeled = (y_true.sum(dim=1) > 0).float().sum()
    if labeled.item() == 0:
        return torch.tensor(0.0)
    ce = -y_true * torch.log(y_hat)
    if class_weights is not None:
        ce = ce * torch.as_tensor(class_weights).float().unsqueeze(0)
    return ce.sum() / labeled


def _torch_propagate(features, y_l, threshold):
    """Reference _label_propagate math (models/wesup.py:99-139): features are
    ordered labeled-first; y_l has the labeled rows only."""
    n_l = y_l.shape[0]
    diff = features.unsqueeze(0) - features.unsqueeze(1)
    W = torch.exp(-(diff * diff).sum(-1))
    W_ul = W[n_l:, :n_l]
    max_sim, src = W_ul.max(dim=1)
    y_u = torch.zeros(features.shape[0] - n_l, y_l.shape[1])
    sel = max_sim > threshold
    y_u[sel] = y_l[src[sel]]
    return y_u


def test_semi_ce_matches_reference_math():
    rng = np.random.default_rng(0)
    probs = rng.dirichlet([1, 1], size=10).astype(np.float32)
    labels = np.zeros((10, 2), np.float32)
    labels[0, 1] = 1
    labels[3, 0] = 1
    labels[7] = [1, 1]  # multi-hot tie row

    got = float(semi_cross_entropy(jnp.asarray(probs), jnp.asarray(labels),
                                   class_weights=(3, 1)))
    want = float(_torch_semi_ce(torch.from_numpy(probs),
                                torch.from_numpy(labels), (3, 1)))
    assert abs(got - want) < 5e-5


def test_semi_ce_no_labels_is_zero():
    probs = jnp.full((4, 2), 0.5)
    labels = jnp.zeros((4, 2))
    assert float(semi_cross_entropy(probs, labels)) == 0.0


def test_propagation_masked_equals_reordered():
    """Build a random problem, run the reference's reordered version in torch
    and our masked version; propagated labels must agree row-for-row."""
    rng = np.random.default_rng(42)
    K, D, C = 14, 5, 2
    feats = rng.standard_normal((K, D)).astype(np.float32) * 0.4
    labeled = rng.random(K) < 0.4
    labeled[0] = True  # ensure at least one source
    labels = np.zeros((K, C), np.float32)
    labels[labeled, rng.integers(0, C, labeled.sum())] = 1

    thr = 0.5
    # ours (masked, unordered)
    prop = label_propagate(jnp.asarray(feats), jnp.asarray(labels),
                           jnp.asarray(labeled),
                           jnp.asarray(~labeled), threshold=thr)
    got = np.asarray(prop.pseudo_labels)

    # reference (reordered)
    order = np.concatenate([np.where(labeled)[0], np.where(~labeled)[0]])
    f_ord = torch.from_numpy(feats[order])
    y_l = torch.from_numpy(labels[labeled])
    y_u_ord = _torch_propagate(f_ord, y_l, thr).numpy()

    # scatter the reordered result back to original indexing
    want = np.zeros_like(labels)
    unl = np.where(~labeled)[0]
    for row, orig_idx in enumerate(unl):
        want[orig_idx] = y_u_ord[row]

    np.testing.assert_allclose(got, want, atol=1e-5)
    # labeled rows never receive pseudo labels
    assert got[labeled].sum() == 0


def test_wesup_loss_unweighted_matches_reference_wiring():
    """The reference trainer binds its CE with NO class weights
    (models/wesup.py:434 — the (3, 1) config field is dead code there).
    Our default (class_weights=None) must reproduce that composition."""
    rng = np.random.default_rng(11)
    K, C, Df = 12, 2, 4
    pred = rng.dirichlet([1, 1], size=K).astype(np.float32)
    feats = rng.standard_normal((K, Df)).astype(np.float32) * 0.3
    labeled = np.zeros(K, bool)
    labeled[:4] = True
    labels = np.zeros((K, C), np.float32)
    labels[np.arange(4), rng.integers(0, C, 4)] = 1
    real = np.ones(K, bool)

    out = wesup_loss(jnp.asarray(pred), jnp.asarray(feats),
                     jnp.asarray(labels), jnp.asarray(labeled),
                     jnp.asarray(real),
                     propagate_threshold=0.6, propagate_weight=0.5)

    order = np.concatenate([np.where(labeled)[0], np.where(~labeled)[0]])
    pred_t = torch.from_numpy(pred[order])
    y_l = torch.from_numpy(labels[labeled])
    ce = _torch_semi_ce(pred_t[:4], y_l, None)
    y_u = _torch_propagate(torch.from_numpy(feats[order]), y_l, 0.6)
    pce = _torch_semi_ce(pred_t[4:], y_u, None)
    want = float(ce + 0.5 * pce)

    assert abs(float(out.loss) - want) < 5e-5


def test_wesup_loss_matches_reference_composition():
    rng = np.random.default_rng(7)
    K, C, Df = 12, 2, 4
    pred = rng.dirichlet([1, 1], size=K).astype(np.float32)
    feats = rng.standard_normal((K, Df)).astype(np.float32) * 0.3
    labeled = np.zeros(K, bool)
    labeled[:4] = True
    labels = np.zeros((K, C), np.float32)
    labels[np.arange(4), rng.integers(0, C, 4)] = 1
    real = np.ones(K, bool)

    out = wesup_loss(jnp.asarray(pred), jnp.asarray(feats),
                     jnp.asarray(labels), jnp.asarray(labeled),
                     jnp.asarray(real), class_weights=(3, 1),
                     propagate_threshold=0.6, propagate_weight=0.5)

    # reference composition: CE on labeled rows + 0.5 * CE(propagated) on
    # unlabeled rows (reordered slicing)
    order = np.concatenate([np.where(labeled)[0], np.where(~labeled)[0]])
    pred_t = torch.from_numpy(pred[order])
    y_l = torch.from_numpy(labels[labeled])
    ce = _torch_semi_ce(pred_t[:4], y_l, (3, 1))
    y_u = _torch_propagate(torch.from_numpy(feats[order]), y_l, 0.6)
    pce = _torch_semi_ce(pred_t[4:], y_u, (3, 1))
    want = float(ce + 0.5 * pce)

    assert abs(float(out.loss) - want) < 5e-5
    assert abs(float(out.labeled_sp_ratio) - 4 / 12) < 1e-6
