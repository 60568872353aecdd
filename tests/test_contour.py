"""Contour output parity (reference utils/data.py:138-151).

The reference computes ``dilation(find_boundaries(mask))`` (skimage: thick
4-neighbor boundaries, 3x3-cross dilation) and one-hots the boolean result
per class.  skimage is unavailable here, so parity is checked against an
independent per-pixel double-loop reimplementation of that spec.
"""

import cv2
import numpy as np

from wesup_tpu.data.datasets import SegmentationDataset, mask_contour

_N4 = ((1, 0), (-1, 0), (0, 1), (0, -1))


def _naive_reference_contour(mask, n_classes):
    """Literal per-pixel spec: thick find_boundaries + cross dilation.

    Out-of-bounds neighbors are ignored — equivalent to skimage's reflect
    border (the reflected neighbor equals the center pixel, which is already
    in the max)."""
    H, W = mask.shape
    fb = np.zeros((H, W), bool)
    for y in range(H):
        for x in range(W):
            for dy, dx in _N4:
                yy, xx = y + dy, x + dx
                if 0 <= yy < H and 0 <= xx < W and mask[yy, xx] != mask[y, x]:
                    fb[y, x] = True
    dil = fb.copy()
    for y in range(H):
        for x in range(W):
            for dy, dx in _N4:
                yy, xx = y + dy, x + dx
                if 0 <= yy < H and 0 <= xx < W and fb[yy, xx]:
                    dil[y, x] = True
    c = dil.astype(np.int64)
    return np.stack([c == i for i in range(n_classes)], -1).astype(np.int32)


def test_mask_contour_matches_reference_spec():
    rng = np.random.default_rng(0)
    # blobby multi-class mask: smooth noise thresholded into 3 classes
    field = cv2.GaussianBlur(rng.random((40, 56)).astype(np.float32), (0, 0), 4)
    mask = np.digitize(field, np.quantile(field, [0.4, 0.75])).astype(np.int32)
    got = mask_contour(mask, n_classes=3)
    want = _naive_reference_contour(mask, n_classes=3)
    np.testing.assert_array_equal(got, want)
    # reference quirk: the boolean boundary image is one-hotted, so channel 1
    # is the boundary, channel 0 its complement, channels >= 2 always empty
    assert got[..., 1].sum() > 0
    assert got[..., 2].sum() == 0
    np.testing.assert_array_equal(got[..., 0] + got[..., 1],
                                  np.ones(mask.shape, np.int32))


def test_mask_contour_constant_mask_is_empty():
    cont = mask_contour(np.ones((8, 8), np.int32), n_classes=2)
    assert cont[..., 1].sum() == 0
    assert cont[..., 0].sum() == 64


def test_segmentation_dataset_returns_contour(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    mask = np.zeros((32, 32), np.uint8)
    mask[8:20, 10:25] = 1
    cv2.imwrite(str(tmp_path / "images" / "a.png"), img)
    cv2.imwrite(str(tmp_path / "masks" / "a.png"), mask)

    ds = SegmentationDataset(tmp_path, contour=True)
    sample = ds[0]
    cont = sample["contour"]
    assert cont.shape == sample["pixel_mask"].shape + (2,)
    np.testing.assert_array_equal(
        cont, mask_contour(sample["pixel_mask"], 2))
    assert cont[..., 1].sum() > 0

    # without the flag the key is absent (parity with the reference's
    # 2-tuple vs 3-tuple return)
    assert "contour" not in SegmentationDataset(tmp_path)[0]
