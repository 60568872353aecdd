"""Precompute superpixel-label masks for WESUPV2 training.

Parity with reference scripts/generate_spl_masks.py:12-56: for every
``points*`` directory, run SLIC per image and set the whole superpixel
containing each annotated point to the point's class; save to
``spl-masks*/<img>.npy``.
"""

import argparse
import csv
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from _common import imread_rgb  # noqa: E402


def generate_spl_mask(img_u8, points, n_classes, sp_area, compactness):
    import jax.numpy as jnp

    from wesup_tpu.ops.slic import slic

    h, w = img_u8.shape[:2]
    seg = np.asarray(slic(jnp.asarray(img_u8.astype(np.float32) / 255.0),
                          sp_area=sp_area, compactness=compactness))
    mask = np.zeros((h, w, n_classes), dtype="uint8")
    for point in points:
        y, x, class_ = point  # reference indexes segments[x, y] with xy csv
        if 0 <= x < h and 0 <= y < w:
            mask[seg == seg[x, y], class_] = 1
    return mask


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("data_root")
    parser.add_argument("--n-classes", type=int, default=2)
    parser.add_argument("--sp-area", type=int, default=200)
    parser.add_argument("--compactness", type=int, default=40)
    args = parser.parse_args()

    data_root = Path(args.data_root).expanduser()
    img_dir = data_root / "images"

    for point_dir in sorted(data_root.glob("points*")):
        if not point_dir.is_dir():
            continue
        print(f"Processing {point_dir} ...")
        img_paths = sorted(img_dir.iterdir())
        point_paths = sorted(point_dir.iterdir())
        output_dir = data_root / point_dir.name.replace("points", "spl-masks")
        output_dir.mkdir(exist_ok=True)

        for img_path, point_path in zip(img_paths, point_paths):
            img = imread_rgb(img_path)
            with open(point_path) as fp:
                points = np.array([[int(d) for d in row]
                                   for row in csv.reader(fp) if row])
            spl = generate_spl_mask(img, points, args.n_classes,
                                    args.sp_area, args.compactness)
            np.save(output_dir / img_path.name.replace(img_path.suffix, ".npy"),
                    spl)
        print(f"Saved to {output_dir}.")


if __name__ == "__main__":
    main()
