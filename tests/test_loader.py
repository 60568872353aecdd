"""CanvasBatcher / dataset loader semantics."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from make_dataset import make_dataset  # noqa: E402

from wesup_tpu.data.datasets import (Digest2019PointDataset,  # noqa: E402
                                     SegmentationDataset)
from wesup_tpu.data.loader import (CanvasBatcher, CanvasSpec,  # noqa: E402
                                   infer_canvas, place_on_canvas)


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("loader_ds")
    return make_dataset(root, n_train=5, n_val=2, hw=(60, 84))


def test_infer_canvas_rounds_up(dataset_root):
    ds = SegmentationDataset(dataset_root / "val", rescale_factor=0.5,
                             train=False)
    spec = infer_canvas(ds)
    assert spec.height % 32 == 0 and spec.width % 32 == 0
    assert spec.height >= 30 and spec.width >= 42


def test_place_on_canvas_pads_and_masks(dataset_root):
    ds = SegmentationDataset(dataset_root / "val", rescale_factor=0.5,
                             train=False)
    spec = CanvasSpec(64, 64)
    item = place_on_canvas(ds[0], spec)
    assert item["image"].shape == (64, 64, 3)
    assert item["valid"][:30, :42].all()
    assert not item["valid"][30:, :].any()
    assert not item["valid"][:, 42:].any()
    # pixel mask outside content is -1
    assert (item["pixel_mask"][30:, :] == -1).all()
    # edge-replicated padding: padded column equals last content column
    np.testing.assert_array_equal(item["image"][:30, 42],
                                  item["image"][:30, 41])


def test_batcher_pads_last_batch(dataset_root):
    ds = SegmentationDataset(dataset_root / "train",
                             multiscale_range=(0.3, 0.4))
    spec = CanvasSpec(48, 48)
    batcher = CanvasBatcher(ds, spec, batch_size=2)
    batches = list(batcher)
    assert len(batches) == 3
    assert all(b["image"].shape == (2, 48, 48, 3) for b in batches)
    assert batches[-1]["sample_valid"].tolist() == [True, False]
    # blank item contributes no valid pixels
    assert not batches[-1]["valid"][1].any()


def test_batcher_shard_multiple_pads_every_batch(dataset_root):
    """Mesh-aware padding: every emitted batch dim is a multiple of
    shard_multiple; blanks carry sample_valid=False; __len__ learns the
    actual bucket-mode batch count after one epoch."""
    ds = SegmentationDataset(dataset_root / "train",
                             multiscale_range=(0.3, 0.4))
    spec = CanvasSpec(48, 48)
    batcher = CanvasBatcher(ds, spec, batch_size=3, shard_multiple=4)
    assert batcher.effective_batch_size == 4
    batches = list(batcher)
    for b in batches:
        assert b["image"].shape[0] == 4
        assert b["sample_valid"].sum() <= 3
    assert sum(int(b["sample_valid"].sum()) for b in batches) == len(ds)

    bucketed = CanvasBatcher(ds, spec, batch_size=2, shard_multiple=2,
                             bucket=True)
    n = len(list(bucketed))
    assert len(bucketed) == n  # exact after the first epoch


def test_batcher_shuffles_deterministically(dataset_root):
    ds = SegmentationDataset(dataset_root / "val", rescale_factor=0.5,
                             train=False)
    spec = CanvasSpec(64, 64)
    b1 = CanvasBatcher(ds, spec, batch_size=1, shuffle=True, seed=3)
    b2 = CanvasBatcher(ds, spec, batch_size=1, shuffle=True, seed=3)
    imgs1 = [b["image"].sum() for b in b1]
    imgs2 = [b["image"].sum() for b in b2]
    assert imgs1 == imgs2


def test_proportion_subsampling_matches_reference_semantics(dataset_root):
    """proportion<1: seeded shuffle, slice, sort (utils/data.py:84-89)."""
    ds = SegmentationDataset(dataset_root / "train", proportion=0.6, seed=0)
    assert len(ds) == 3
    np.random.seed(0)
    picked = np.arange(5)
    np.random.shuffle(picked)
    picked = np.sort(picked[:3])
    np.testing.assert_array_equal(ds.picked, picked)


def test_digest_negative_convention(tmp_path):
    import cv2

    root = tmp_path / "neg"
    for sub in ("images", "masks", "points"):
        (root / sub).mkdir(parents=True)
    img = np.full((40, 40, 3), 200, np.uint8)
    mask = np.zeros((40, 40), np.uint8)
    cv2.imwrite(str(root / "images" / "negative-01.png"), img)
    cv2.imwrite(str(root / "masks" / "negative-01.png"), mask)
    (root / "points" / "negative-01.csv").write_text("")

    ds = Digest2019PointDataset(root, rescale_factor=1.0, train=False)
    sample = ds[0]
    assert sample["use_mask_as_points"] is True or sample["use_mask_as_points"]
    np.testing.assert_array_equal(sample["points"], [[0, 0, 0]])
