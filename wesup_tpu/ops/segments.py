"""Superpixel aggregation ops: label vote, feature pooling, painting.

This is `_preprocess_superpixels` (reference: models/wesup.py:18-63) and the
superpixel feature averaging matmul (models/wesup.py:284-285) rebuilt for
static shapes.  The reference reorders superpixels so labeled ones come
first and slices `sp_pred[:labeled_num]` in the loss (models/wesup.py:44-47,
508-517); we keep a fixed K and carry boolean masks instead — equivalence is
proven in tests/test_loss.py against a literal reordering implementation.

Pooling is the dense one-hot matmul form of segment-mean: the (HW, K) one-hot
assignment matrix rides the MXU, which on TPU beats scatter-based
`segment_sum` for these sizes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class SuperpixelStats(NamedTuple):
    labels: jnp.ndarray      # (K, C) float quantized one/multi-hot labels
    labeled: jnp.ndarray     # (K,) bool: has >=1 annotated pixel
    real: jnp.ndarray        # (K,) bool: has >=1 valid pixel
    counts: jnp.ndarray      # (K,) float valid-pixel counts


def one_hot_assignment(seg: jnp.ndarray, K: int, valid=None,
                       dtype=jnp.float32) -> jnp.ndarray:
    """(H*W, K) one-hot matrix of the segment assignment (0 for invalid px)."""
    oh = (seg.reshape(-1)[:, None] == jnp.arange(K, dtype=seg.dtype)[None, :])
    oh = oh.astype(dtype)
    if valid is not None:
        oh = oh * valid.reshape(-1)[:, None].astype(dtype)
    return oh


def superpixel_stats(seg: jnp.ndarray, K: int, mask_onehot: jnp.ndarray | None,
                     valid: jnp.ndarray | None = None) -> SuperpixelStats:
    """Majority-vote labels per superpixel.

    Args:
        seg: (H, W) int32 assignments in [0, K).
        mask_onehot: (H, W, C) 0/1 annotation (point or pixel mask), or None
            for "no supervision".
        valid: (H, W) bool canvas-validity mask.

    Matches reference semantics (models/wesup.py:33-52): a superpixel is
    labeled iff it contains any annotated pixel; its label is the class-count
    vector quantized by == max (ties produce multi-hot rows, as in the
    reference's `(sp_labels == sp_labels.max(...)).float()`).
    """

    oh = one_hot_assignment(seg, K, valid)  # (HW, K)
    counts = oh.sum(axis=0)  # (K,)
    real = counts > 0

    if mask_onehot is None:
        C = 0
        labels = jnp.zeros((K, 0), jnp.float32)
        labeled = jnp.zeros((K,), bool)
        return SuperpixelStats(labels, labeled, real, counts)

    C = mask_onehot.shape[-1]
    sums = oh.T @ mask_onehot.reshape(-1, C).astype(jnp.float32)  # (K, C)
    labeled = sums.sum(axis=-1) > 0
    quant = (sums == sums.max(axis=-1, keepdims=True)).astype(jnp.float32)
    labels = quant * labeled[:, None].astype(jnp.float32)
    return SuperpixelStats(labels, labeled, real, counts)


def segment_mean(features: jnp.ndarray, assignment: jnp.ndarray,
                 counts: jnp.ndarray) -> jnp.ndarray:
    """Mean-pool (HW, C) features into (K, C) via the one-hot matmul.

    `assignment` is the (HW, K) matrix from :func:`one_hot_assignment`.
    Equivalent to the reference's `sp_maps @ x.t()` with row-normalized
    sp_maps (models/wesup.py:61, 284-285).
    """
    dtype = features.dtype
    pooled = jnp.einsum("pk,pc->kc", assignment.astype(dtype), features,
                        preferred_element_type=jnp.float32)
    return pooled / jnp.maximum(counts[:, None], 1.0)


def paint(seg: jnp.ndarray, sp_values: jnp.ndarray) -> jnp.ndarray:
    """Broadcast per-superpixel values (K, C) back to pixels (H, W, C).

    Replaces the reference's python loop over superpixels
    (models/wesup.py:301-302) with a single gather.
    """
    return sp_values[seg]
