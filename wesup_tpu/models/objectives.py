"""WESUP training objectives: semi-supervised CE + similarity label propagation.

Reference: ``_cross_entropy`` (models/wesup.py:66-96) and ``_label_propagate``
(models/wesup.py:99-139).  The reference relies on a "labeled superpixels
first" permutation and slices ``sp_pred[:labeled_num]`` /
``sp_pred[labeled_num:]`` (models/wesup.py:508-517); here everything is
masked instead of reordered, over a fixed K, with identical math (equivalence
test: tests/test_loss.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def semi_cross_entropy(y_hat: jnp.ndarray, y_true: jnp.ndarray,
                       class_weights=None, epsilon: float = 1e-7) -> jnp.ndarray:
    """Cross entropy over rows that have a (possibly multi-hot) label.

    Args:
        y_hat: (..., N, C) predicted probabilities.
        y_true: (..., N, C) labels; all-zero rows are excluded.  Rows may be
            multi-hot (label-vote ties), as in the reference.
        class_weights: optional (C,) weights.

    Returns scalar loss = sum(-w * y * log(clip(y_hat))) / #labeled_rows,
    or 0 if no row is labeled (reference models/wesup.py:86-96).
    """
    y_hat = jnp.clip(y_hat, epsilon, 1.0 - epsilon)
    labeled = jnp.sum(y_true, axis=-1) > 0
    n_labeled = jnp.sum(labeled.astype(jnp.float32))
    ce = -y_true * jnp.log(y_hat)
    if class_weights is not None:
        ce = ce * jnp.asarray(class_weights, dtype=ce.dtype)
    total = jnp.sum(ce)
    return jnp.where(n_labeled > 0, total / jnp.maximum(n_labeled, 1.0), 0.0)


class Propagation(NamedTuple):
    pseudo_labels: jnp.ndarray  # (K, C): zeros for non-propagated rows
    n_propagated: jnp.ndarray   # scalar count


def label_propagate(features: jnp.ndarray, labels: jnp.ndarray,
                    labeled: jnp.ndarray, candidate: jnp.ndarray,
                    threshold: float = 0.95) -> Propagation:
    """Similarity-graph label propagation (reference models/wesup.py:99-139).

    For each *candidate* (unlabeled, real) superpixel, find the labeled
    superpixel with maximum affinity W_ij = exp(-||f_i - f_j||^2); copy its
    label iff that affinity exceeds ``threshold``.

    Args:
        features: (K, D) propagation features (fc3 outputs).  Gradients are
            stopped, as the reference detaches (models/wesup.py:113-114).
        labels: (K, C) quantized labels (zero rows where unlabeled).
        labeled: (K,) bool mask of labeled superpixels.
        candidate: (K,) bool mask of rows eligible to RECEIVE a label
            (unlabeled AND real; padding-only superpixels are excluded).
        threshold: similarity threshold (trainer passes 0.8).
    """
    f = jax.lax.stop_gradient(features.astype(jnp.float32))
    labels = jax.lax.stop_gradient(labels)

    sq = jnp.sum(f * f, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (f @ f.T)
    d2 = jnp.maximum(d2, 0.0)
    sim = jnp.exp(-d2)  # (K, K)

    # only labeled columns are valid sources
    sim = jnp.where(labeled[None, :], sim, -jnp.inf)
    max_sim = jnp.max(sim, axis=1)
    src = jnp.argmax(sim, axis=1)

    receive = candidate & (max_sim > threshold)
    pseudo = jnp.where(receive[:, None], labels[src], 0.0)
    return Propagation(pseudo, jnp.sum(receive.astype(jnp.float32)))


class WESUPLoss(NamedTuple):
    loss: jnp.ndarray
    ce_loss: jnp.ndarray
    propagate_loss: jnp.ndarray
    labeled_sp_ratio: jnp.ndarray
    propagated_labels: jnp.ndarray


def wesup_loss(sp_pred: jnp.ndarray, sp_features: jnp.ndarray,
               sp_labels: jnp.ndarray, labeled: jnp.ndarray,
               real: jnp.ndarray, *, class_weights=None,
               enable_propagation: bool = True,
               propagate_threshold: float = 0.8,
               propagate_weight: float = 0.5,
               epsilon: float = 1e-7) -> WESUPLoss:
    """Full WESUP objective for ONE image (vmap over batch).

    loss = CE(labeled sps) + propagate_weight * CE(propagated unlabeled sps)
    (reference WESUPTrainer.compute_loss, models/wesup.py:492-531).

    ``class_weights`` defaults to None because the reference's trainer binds
    its CE weight-free (models/wesup.py:434) — its ``class_weights=(3, 1)``
    config is dead code.  Pass weights explicitly to opt in.
    """
    ce = semi_cross_entropy(sp_pred, sp_labels, class_weights, epsilon)

    if enable_propagation:
        prop = label_propagate(sp_features, sp_labels, labeled,
                               candidate=(~labeled) & real,
                               threshold=propagate_threshold)
        prop_ce = semi_cross_entropy(sp_pred, prop.pseudo_labels,
                                     class_weights, epsilon)
        loss = ce + propagate_weight * prop_ce
        n_prop = jnp.sum(prop.pseudo_labels)
    else:
        prop_ce = jnp.zeros(())
        n_prop = jnp.zeros(())
        loss = ce

    n_real = jnp.maximum(jnp.sum(real.astype(jnp.float32)), 1.0)
    ratio = jnp.sum((labeled & real).astype(jnp.float32)) / n_real
    return WESUPLoss(loss, ce, prop_ce, ratio, n_prop)
