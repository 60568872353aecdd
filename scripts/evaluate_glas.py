"""Offline GlaS evaluation: postprocess + contest metrics, per-image CSV.

Parity with reference scripts/evaluate_glas.py: flip foreground regions and
holes smaller than 2000 px (evaluate_glas.py:29-42), evaluate accuracy /
Dice / detection F1 / object Dice / object Hausdorff per image on
testA/testB, write <pred_root>/testA.csv and testB.csv, and save the
postprocessed predictions to <pred_root>-new/.

The reference hardcodes the GT root as ~/data/GLAS_all; that default is kept
but overridable with --gt-root.
"""

import argparse
import os
import sys
from pathlib import Path

import numpy as np
import pandas as pd
from joblib import Parallel, delayed

sys.path.insert(0, str(Path(__file__).parent))
from _common import REPO_ROOT, imread_gray, imsave  # noqa: E402,F401

from wesup_tpu.ops.morphology import flip_small_regions  # noqa: E402
from wesup_tpu.utils.metrics import (accuracy, detection_f1, dice,  # noqa: E402
                                     object_dice, object_hausdorff)


def postprocess(pred, threshold=2000):
    return flip_small_regions(pred, threshold)


def compute_metrics(executor, predictions, gts, pred_paths):
    pairs = list(zip(predictions, gts))
    accuracies = executor(delayed(accuracy)(p, g) for p, g in pairs)
    print("Accuracy:", np.mean(accuracies))
    dices = executor(delayed(dice)(p, g) for p, g in pairs)
    print("Dice:", np.mean(dices))
    f1s = executor(delayed(detection_f1)(p, g) for p, g in pairs)
    print("Detection F1:", np.mean(f1s))
    odices = executor(delayed(object_dice)(p, g) for p, g in pairs)
    print("Object Dice:", np.mean(odices))
    ohds = executor(delayed(object_hausdorff)(p, g) for p, g in pairs)
    print("Object Hausdorff:", np.mean(ohds))

    df = pd.DataFrame()
    df["detection_f1"] = f1s
    df["object_dice"] = odices
    df["object_hausdorff"] = ohds
    df.index = [p.name for p in pred_paths]
    return df


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("pred_root")
    parser.add_argument("--gt-root", default=str(Path("~/data/GLAS_all")))
    parser.add_argument("--threshold", type=int, default=2000)
    parser.add_argument("--ext", default="bmp")
    args = parser.parse_args()

    glas_root = Path(args.gt_root).expanduser()
    pred_root = Path(args.pred_root).expanduser()
    new_pred_root = pred_root.parent / (pred_root.name + "-new")
    executor = Parallel(n_jobs=os.cpu_count())

    for split in ("testA", "testB"):
        print(f"\n{split}")
        (new_pred_root / split).mkdir(parents=True, exist_ok=True)
        pred_paths = sorted((pred_root / split).glob(f"*.{args.ext}"))
        if not pred_paths:
            pred_paths = sorted((pred_root / split).glob("*.png"))
        print("\nReading predictions and gts ...")
        predictions = executor(
            delayed(postprocess)(imread_gray(p) / 255, args.threshold)
            for p in pred_paths)
        gt_paths = sorted((glas_root / split / "masks").iterdir())
        gts = executor(delayed(imread_gray)(g) for g in gt_paths)

        print("Saving new predictions ...")
        for pred, pred_path in zip(predictions, pred_paths):
            imsave(new_pred_root / split / pred_path.name,
                   (pred * 255).astype("uint8"))

        metrics = compute_metrics(executor, predictions, gts, pred_paths)
        metrics.to_csv(pred_root / f"{split}.csv")


if __name__ == "__main__":
    main()
