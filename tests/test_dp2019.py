"""test_dp2019_pipeline split/stitch math (host-side; no device needed)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from test_dp2019_pipeline import combine_single, dice, oa, split_patches  # noqa: E402


def test_split_and_combine_roundtrip(tmp_path):
    import cv2

    root = tmp_path / "dp"
    (root / "images").mkdir(parents=True)
    (root / "masks").mkdir(parents=True)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (250, 330, 3)).astype(np.uint8)
    mask = (rng.random((250, 330)) < 0.3).astype(np.uint8) * 255
    cv2.imwrite(str(root / "images" / "positive-00.jpg"), img)
    cv2.imwrite(str(root / "masks" / "positive-00.png"), mask)

    patch_dir = split_patches(root, patch_size=100)
    assert (patch_dir / "info.csv").exists()
    patches = sorted((patch_dir / "masks").glob("0-*.png"))
    # grid covers ceil(330/100)x... padded-to-grid coordinates at 0,100,...
    assert len(patches) >= 12

    combined = combine_single(patches, (250, 330))
    np.testing.assert_array_equal(combined, mask)

    assert oa(combined, mask) == 1.0
    assert abs(dice(combined, mask) - 1.0) < 1e-6


def test_split_patches_skips_existing(tmp_path, capsys):
    import cv2

    root = tmp_path / "dp2"
    (root / "images").mkdir(parents=True)
    (root / "masks").mkdir(parents=True)
    img = np.zeros((120, 120, 3), np.uint8)
    cv2.imwrite(str(root / "images" / "negative-00.jpg"), img)
    cv2.imwrite(str(root / "masks" / "negative-00.png"), img[..., 0])
    d1 = split_patches(root, 60)
    d2 = split_patches(root, 60)
    assert d1 == d2
    assert "Skipping" in capsys.readouterr().out
