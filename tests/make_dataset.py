"""Tiny synthetic GlaS-style dataset generator for tests and smoke runs.

Layout matches the reference's expectations (README.md data layout):
    root/train/{images,masks,points}/..., root/val/{images,masks}/...
Point CSVs are (x, y, class) rows, like scripts/generate_points.py output.
"""

from pathlib import Path

import cv2
import numpy as np


def make_image(rng, h, w):
    img = np.clip(rng.normal(215, 12, (h, w, 3)), 0, 255).astype(np.uint8)
    mask = np.zeros((h, w), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(rng.integers(2, 5)):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        r = rng.integers(min(h, w) // 8, min(h, w) // 4)
        blob = (yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2
        mask[blob] = 1
        color = rng.normal([160, 110, 170], 8)
        img[blob] = np.clip(color + rng.normal(0, 6, (blob.sum(), 3)), 0, 255)
    return img, mask


def sample_points(rng, mask, per_class=3):
    rows = []
    for cls in (0, 1):
        ys, xs = np.where(mask == cls)
        if len(ys) == 0:
            continue
        take = rng.choice(len(ys), size=min(per_class, len(ys)), replace=False)
        for i in take:
            rows.append((int(xs[i]), int(ys[i]), cls))
    return rows


def make_dataset(root, n_train=4, n_val=2, hw=(96, 128), seed=0,
                 with_points=True):
    """``hw`` may be one (H, W) or a list of sizes cycled over the images
    (for multi-size/bucketed-loader tests)."""
    root = Path(root)
    rng = np.random.default_rng(seed)
    sizes = list(hw) if isinstance(hw[0], (tuple, list)) else [hw]
    for split, n in [("train", n_train), ("val", n_val)]:
        img_dir = root / split / "images"
        mask_dir = root / split / "masks"
        img_dir.mkdir(parents=True, exist_ok=True)
        mask_dir.mkdir(parents=True, exist_ok=True)
        point_dir = None
        if with_points and split == "train":
            point_dir = root / split / "points"
            point_dir.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img, mask = make_image(rng, *sizes[i % len(sizes)])
            name = f"{split}_{i:02d}"
            cv2.imwrite(str(img_dir / f"{name}.png"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            cv2.imwrite(str(mask_dir / f"{name}.png"), mask)
            if point_dir is not None:
                rows = sample_points(rng, mask)
                with open(point_dir / f"{name}.csv", "w") as fp:
                    for x, y, c in rows:
                        fp.write(f"{x},{y},{c}\n")
    return root


if __name__ == "__main__":
    import sys

    make_dataset(sys.argv[1] if len(sys.argv) > 1 else "/tmp/wesup_synth")
