"""Visualize point annotations as colored circles over (boundary-marked)
images (parity with reference scripts/visualize_points.py:41-62)."""

import argparse
import csv
import os
import sys
from pathlib import Path

from joblib import Parallel, delayed

sys.path.insert(0, str(Path(__file__).parent))
import cv2  # noqa: E402

from _common import imread_gray, imread_rgb, imsave, mark_boundaries  # noqa: E402

COLORS = (
    (0, 255, 0),
    (255, 0, 0),
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("point_root", help="Path to point labels directory")
    parser.add_argument("-r", "--radius", type=int, default=5)
    parser.add_argument("-o", "--output")
    args = parser.parse_args()

    point_root = Path(args.point_root)
    output_dir = Path(args.output) if args.output else point_root / "viz"
    output_dir.mkdir(exist_ok=True)

    img_dir = point_root.parent / "images"
    mask_dir = point_root.parent / "masks"
    print(f"Generating dot annotation visualization to {output_dir} ...")

    def para_func(img_name):
        basename = os.path.splitext(img_name)[0]
        img = imread_rgb(img_dir / img_name)
        if mask_dir.exists():
            mask = imread_gray(mask_dir / img_name)
            img = mark_boundaries(img, mask)
        with open(point_root / f"{basename}.csv") as fp:
            for point in csv.reader(fp):
                x, y, cls = (int(d) for d in point)
                cv2.circle(img, (x, y), args.radius, COLORS[cls], -1)
        imsave(output_dir / img_name, img)

    Parallel(n_jobs=os.cpu_count())(
        delayed(para_func)(name) for name in sorted(os.listdir(img_dir)))


if __name__ == "__main__":
    main()
