"""evaluate_glas.py CLI end-to-end on synthetic predictions."""

import subprocess
import sys
from pathlib import Path

import cv2
import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def eval_tree(tmp_path):
    rng = np.random.default_rng(0)
    pred_root = tmp_path / "preds"
    gt_root = tmp_path / "gt"
    for split in ("testA", "testB"):
        (pred_root / split).mkdir(parents=True)
        (gt_root / split / "masks").mkdir(parents=True)
        for i in range(2):
            gt = np.zeros((120, 120), np.uint8)
            cv2.circle(gt, (40, 40), 25, 1, -1)
            cv2.circle(gt, (90, 90), 15, 1, -1)
            pred = gt.copy()
            pred[rng.random((120, 120)) < 0.005] ^= 1  # speckle
            cv2.imwrite(str(gt_root / split / "masks" / f"img_{i}.png"), gt)
            cv2.imwrite(str(pred_root / split / f"img_{i}.png"), pred * 255)
    return pred_root, gt_root


def test_evaluate_glas_cli(eval_tree):
    pred_root, gt_root = eval_tree
    out = subprocess.run(
        [sys.executable,
         str(Path(__file__).parent.parent / "scripts" / "evaluate_glas.py"),
         str(pred_root), "--gt-root", str(gt_root), "--threshold", "50"],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-500:]
    assert "Detection F1" in out.stdout

    for split in ("testA", "testB"):
        df = pd.read_csv(pred_root / f"{split}.csv", index_col=0)
        assert len(df) == 2
        assert (df["detection_f1"] > 0.99).all()
        assert (df["object_dice"] > 0.95).all()
        # postprocessed copies saved
        assert len(list((pred_root.parent / "preds-new" / split).iterdir())) == 2


def test_factory_rejects_unknown_model():
    from wesup_tpu.models import initialize_trainer

    with pytest.raises(ValueError, match="Unsupported model"):
        initialize_trainer("mild")


def test_dataset_target_size_mode(tmp_path):
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from make_dataset import make_dataset

    root = make_dataset(tmp_path / "ts", n_train=1, n_val=1, hw=(50, 70))
    from wesup_tpu.data.datasets import SegmentationDataset

    ds = SegmentationDataset(root / "val", target_size=(40, 48), train=False)
    s = ds[0]
    assert s["image"].shape == (40, 48, 3)
    assert s["pixel_mask"].shape == (40, 48)
