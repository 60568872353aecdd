"""Offline CRAG evaluation (parity with reference scripts/evaluate_crag.py).

Same postprocess as GlaS but with a 5000 px region-flip threshold
(evaluate_crag.py:29-42).  The reference hardcodes its author's GT path
(evaluate_crag.py:65); here it defaults to ~/data/CRAG/test/masks and is
overridable.
"""

import argparse
import os
import sys
from pathlib import Path

import numpy as np
from joblib import Parallel, delayed

sys.path.insert(0, str(Path(__file__).parent))
from _common import imread_gray, imsave  # noqa: E402

from wesup_tpu.ops.morphology import flip_small_regions  # noqa: E402
from wesup_tpu.utils.metrics import (accuracy, detection_f1, dice,  # noqa: E402
                                     object_dice, object_hausdorff)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("pred_root")
    parser.add_argument("--gt-root", default=str(Path("~/data/CRAG/test/masks")))
    parser.add_argument("--threshold", type=int, default=5000)
    args = parser.parse_args()

    pred_root = Path(args.pred_root).expanduser()
    new_pred_root = Path(str(pred_root) + "-new")
    new_pred_root.mkdir(exist_ok=True)
    executor = Parallel(n_jobs=os.cpu_count())

    print("Reading predictions and gts ...")
    pred_paths = sorted(pred_root.glob("*.png"))
    predictions = executor(
        delayed(flip_small_regions)(imread_gray(p) / 255, args.threshold)
        for p in pred_paths)
    gts = executor(delayed(imread_gray)(g)
                   for g in sorted(Path(args.gt_root).expanduser().glob("*.png")))

    print("Saving new predictions ...")
    for pred, pred_path in zip(predictions, pred_paths):
        imsave(new_pred_root / pred_path.name, (pred * 255).astype("uint8"))

    pairs = list(zip(predictions, gts))
    for name, func in [("Accuracy", accuracy), ("Dice", dice),
                       ("Detection F1", detection_f1),
                       ("Object Dice", object_dice),
                       ("Object Hausdorff", object_hausdorff)]:
        vals = executor(delayed(func)(p, g) for p, g in pairs)
        print(f"{name}:", np.mean(vals))


if __name__ == "__main__":
    main()
