"""Instance-colored prediction-vs-GT paintings (parity with reference
scripts/paint_masks.py): predicted objects that overlap a GT object by >0.5
of the GT area inherit its color; unmatched ones get fresh colors."""

import argparse
import os
import sys
from itertools import product
from pathlib import Path

import numpy as np
from joblib import Parallel, delayed

sys.path.insert(0, str(Path(__file__).parent))
from _common import imread_gray, imsave, label8, list_images  # noqa: E402

colors = list(product([0, 64, 128, 192, 255], repeat=3))
colors = [c for c in colors if 192 < sum(c) < 765]
np.random.seed(42)
np.random.shuffle(colors)


def paint(mask):
    painted = np.zeros((*mask.shape, 3), dtype="uint8")
    for region_id in np.unique(mask):
        if region_id >= len(colors):
            painted[mask == region_id] = np.random.randint(
                0, 256, size=(3,), dtype="uint8")
        if 0 < region_id < len(colors):
            painted[mask == region_id] = colors[region_id]
    return painted


def paint_pred_and_gt(pred, gt):
    pred, gt = label8(pred), label8(gt)
    new_pred = np.zeros_like(pred)
    max_id = max(pred.max(), gt.max())

    for pred_region_id in range(1, pred.max() + 1):
        pred_region = pred == pred_region_id
        matched = []
        for gt_region_id in range(1, gt.max() + 1):
            gt_region = gt == gt_region_id
            if (pred_region & gt_region).sum() / gt_region.sum() > 0.5:
                matched.append((gt_region, gt_region_id))
        if matched:
            new_pred[pred_region] = max(matched, key=lambda x: x[0].sum())[1]
        else:
            new_pred[pred_region] = max_id + pred_region_id
    return paint(new_pred), paint(gt)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("pred_path")
    parser.add_argument("gt_path")
    parser.add_argument("-m", "--model")
    parser.add_argument("-o", "--output")
    args = parser.parse_args()

    pred_paths = list_images(Path(args.pred_path))
    gt_paths = list_images(Path(args.gt_path))
    executor = Parallel(os.cpu_count())

    print("Reading predictions and masks ...")
    preds = executor(delayed(imread_gray)(p) for p in pred_paths)
    gts = executor(delayed(imread_gray)(p) for p in gt_paths)

    print("Painting ...")
    paintings = executor(delayed(paint_pred_and_gt)(p, g)
                         for p, g in zip(preds, gts))

    output_dir = (Path(args.output) if args.output
                  else Path(args.pred_path).parent / "paintings")
    output_dir.mkdir(exist_ok=True)
    for (pred_img, gt_img), pred_path in zip(paintings, pred_paths):
        imsave(output_dir / f"{pred_path.stem}.{args.model or 'pred'}.png",
               pred_img)
        imsave(output_dir / f"{pred_path.stem}.gt.png", gt_img)
    print("Done")


if __name__ == "__main__":
    main()
