"""Weak-label generator: sample sparse point annotations from full masks.

Behavior parity with reference scripts/generate_points.py:
- per foreground class, per connected region, sample max(1, area*point_ratio)
  points; single-sample regions jitter around the centroid within +-5 with
  <=5 retries (generate_points.py:22-45);
- background sampled at area*ratio over the whole class mask
  (generate_points.py:56-62);
- output CSV rows are (x, y, class) — the reference swaps its (row, col)
  samples into xy order at generate_points.py:107.
"""

import argparse
import csv
import os
import sys
from pathlib import Path

import numpy as np
from joblib import Parallel, delayed

sys.path.insert(0, str(Path(__file__).parent))
from _common import imread_gray, label8  # noqa: E402


def _sample_within_region(rng, region_mask, class_label, num_samples=1):
    xs, ys = np.where(region_mask)

    if num_samples == 1:
        x_center = int(np.round(xs.mean()))
        y_center = int(np.round(ys.mean()))
        for _ in range(6):
            x = x_center + rng.integers(-5, 6)
            y = y_center + rng.integers(-5, 6)
            if (0 <= x < region_mask.shape[0] and 0 <= y < region_mask.shape[1]
                    and region_mask[x, y]):
                return np.c_[x, y, class_label]

    selected = rng.permutation(len(xs))[:num_samples]
    xs, ys = xs[selected], ys[selected]
    return np.c_[xs, ys, np.full_like(xs, class_label)]


def generate_points(mask, point_ratio=1e-4, rng=None):
    rng = rng or np.random.default_rng()
    points = []
    for class_label in np.unique(mask):
        class_mask = mask == class_label
        if class_label == 0:
            n = int(class_mask.sum() * point_ratio)
            if n > 0:
                points.append(_sample_within_region(rng, class_mask,
                                                    class_label, n))
        else:
            regions = label8(class_mask)
            for idx in np.unique(regions[regions > 0]):
                region_mask = regions == idx
                n = max(1, int(region_mask.sum() * point_ratio))
                points.append(_sample_within_region(rng, region_mask,
                                                    class_label, n))
    if not points:
        return np.zeros((0, 3), int)
    return np.concatenate(points)


def main():
    parser = argparse.ArgumentParser("Dot annotation generator.")
    parser.add_argument("root_dir",
                        help="Path to data root directory with masks")
    parser.add_argument("-p", "--point-ratio", type=float, default=1e-4,
                        help="Percentage of labeled pixels for each class")
    parser.add_argument("--seed", type=int, default=None)
    args = parser.parse_args()

    mask_dir = Path(args.root_dir) / "masks"
    if not mask_dir.exists():
        print("Cannot generate dot annotation without masks.")
        sys.exit(1)

    label_dir = Path(args.root_dir) / f"points-{str(args.point_ratio)}"
    label_dir.mkdir(exist_ok=True)
    print("Generating point annotation ...")

    def para_func(fname):
        rng = np.random.default_rng(args.seed)
        basename = os.path.splitext(fname)[0]
        mask = np.asarray(imread_gray(mask_dir / fname))
        points = generate_points(mask, point_ratio=args.point_ratio, rng=rng)
        points[:, [0, 1]] = points[:, [1, 0]]  # (row, col) -> (x, y)
        with open(label_dir / f"{basename}.csv", "w") as fp:
            csv.writer(fp).writerows(points.tolist())
        return len(points)

    counts = Parallel(n_jobs=os.cpu_count())(
        delayed(para_func)(f) for f in sorted(os.listdir(mask_dir)))
    print(f"Average number of points: {np.mean(counts)}.")


if __name__ == "__main__":
    main()
