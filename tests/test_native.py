"""C++ native kernels vs scipy references."""

import numpy as np
import pytest
from scipy import ndimage
from scipy.spatial.distance import directed_hausdorff

from wesup_tpu import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native library unavailable (no toolchain)")


def _random_mask(seed, h=60, w=80, p=0.3):
    rng = np.random.default_rng(seed)
    mask = rng.random((h, w)) < p
    # add a few blobs for structure
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(3):
        cy, cx, r = rng.integers(0, h), rng.integers(0, w), rng.integers(5, 15)
        mask |= (yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2
    return mask


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_label8_matches_scipy(seed):
    mask = _random_mask(seed)
    ours = native.label8(mask)
    ref, n_ref = ndimage.label(mask, structure=np.ones((3, 3)))
    assert ours.max() == n_ref
    # same partition: one-to-one mapping between label ids
    for k in range(1, n_ref + 1):
        ids = np.unique(ours[ref == k])
        assert len(ids) == 1 and ids[0] > 0
    assert (ours > 0).sum() == (ref > 0).sum()


@pytest.mark.parametrize("seed", [0, 3])
def test_edt_matches_scipy(seed):
    mask = _random_mask(seed, p=0.05)
    ours = native.edt_sq(mask)
    ref = ndimage.distance_transform_edt(~mask)
    np.testing.assert_allclose(np.sqrt(ours), ref, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 5])
def test_hausdorff_matches_scipy(seed):
    a = _random_mask(seed, p=0.02)
    b = _random_mask(seed + 100, p=0.02)
    ours = native.hausdorff(a, b)
    Ac = np.column_stack(np.where(a))
    Bc = np.column_stack(np.where(b))
    ref = max(directed_hausdorff(Ac, Bc)[0], directed_hausdorff(Bc, Ac)[0])
    assert abs(ours - ref) < 1e-6


def test_hausdorff_empty_cases():
    z = np.zeros((10, 10), bool)
    o = np.zeros((10, 10), bool)
    o[5, 5] = True
    assert native.hausdorff(z, z) == 0.0
    assert np.isinf(native.hausdorff(z, o))


def test_flip_small_regions_matches_python():
    from wesup_tpu.ops.morphology import flip_small_regions as py_flip

    mask = np.zeros((100, 100), np.uint8)
    mask[10:60, 10:60] = 1
    mask[80:84, 80:84] = 1
    mask[30:34, 30:34] = 0
    ours = native.flip_small_regions(mask.copy(), 100)
    ref = py_flip(mask.copy(), 100)
    np.testing.assert_array_equal(ours, ref)
