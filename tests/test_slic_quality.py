"""SLIC quality acceptance: oracle accuracy parity with a CPU reference SLIC.

The acceptance criterion from SURVEY.md §7 ("Hard parts" 1): our fixed-K
on-device SLIC must reach the same superpixel-oracle accuracy (majority-vote
upper bound against the mask, cf. reference scripts/search_slic_params.py)
as a faithful CPU SLIC implementation.
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import _cpu_slic_once  # noqa: E402
from make_dataset import make_image  # noqa: E402

from wesup_tpu.ops.slic import slic  # noqa: E402


def _oracle(seg, mask):
    seg = np.asarray(seg).reshape(-1)
    m = np.asarray(mask).reshape(-1).astype(np.float64)
    K = seg.max() + 1
    sums = np.bincount(seg, weights=m, minlength=K)
    cnts = np.bincount(seg, minlength=K)
    votes = np.round(sums / np.maximum(cnts, 1))
    return float((votes[seg] == m).mean())


def test_subsampled_updates_keep_oracle_accuracy():
    """The production default (config slic_update_stride=3) must stay at
    oracle-accuracy parity with the exact full-grid k-means (stride 1)."""
    from wesup_tpu.config import WESUPConfig

    strides = sorted({2, WESUPConfig().slic_update_stride})
    rng = np.random.default_rng(5)
    exact = []
    subs = {s: [] for s in strides}
    for _ in range(3):
        img, mask = make_image(rng, 120, 160)
        f = jnp.asarray(img.astype(np.float32) / 255.0)
        exact.append(_oracle(slic(f, sp_area=200, compactness=40.0), mask))
        for s in strides:
            subs[s].append(_oracle(slic(f, sp_area=200, compactness=40.0,
                                        update_stride=s), mask))
    for s in strides:
        assert np.mean(subs[s]) > np.mean(exact) - 0.005, (
            s, np.mean(subs[s]), np.mean(exact))


def test_oracle_accuracy_matches_cpu_slic():
    rng = np.random.default_rng(0)
    ours_acc, cpu_acc = [], []
    for i in range(3):
        img, mask = make_image(rng, 120, 160)
        img_f = img.astype(np.float32) / 255.0
        seg_ours = slic(jnp.asarray(img_f), sp_area=200, compactness=40.0)
        seg_cpu = _cpu_slic_once(img_f, sp_area=200, compactness=40.0)
        ours_acc.append(_oracle(seg_ours, mask))
        cpu_acc.append(_oracle(seg_cpu, mask))
    ours, cpu = np.mean(ours_acc), np.mean(cpu_acc)
    # within 1% of the CPU reference implementation (either direction)
    assert ours > cpu - 0.01, (ours, cpu)
    # and high in absolute terms on these structured images
    assert ours > 0.93, ours
