"""DigestPath2019 pipeline driver (parity with reference
test_dp2019_pipeline.py): pad-and-split whole slides into a patch grid with
an info.csv, infer per patch (superpixel input_size=(400,400) or pixel-wise
at scale 0.4), stitch patches back, then report positive/negative overall
accuracy and Dice."""

import argparse
import csv
import math
from itertools import product
from pathlib import Path
from shutil import rmtree

import cv2
import numpy as np
from joblib import Parallel, delayed


def split_patches(data_root, patch_size):
    """Tile whole slides into a zero-padded patch grid.

    Pinned protocol (what the combining/eval stages and the reference expect):
    patches are named ``{slide_index}-{x}-{y}`` with top-left pixel origin,
    images saved as .jpg and masks as .png, and ``info.csv`` rows are
    ``(stem, original_height, original_width)``.  The reference additionally
    emits a degenerate empty patch whenever a dimension is an exact multiple
    of ``patch_size`` (its ranges run to ``dim + 1``); that is a bug, not
    protocol, and is not reproduced.
    """
    output_dir = data_root.parent / f"{data_root.name}-patches"
    if output_dir.exists():
        print(f"{output_dir} found. Skipping.")
        return output_dir
    for sub in ("images", "masks"):
        (output_dir / sub).mkdir(parents=True, exist_ok=True)

    img_paths = sorted(list((data_root / "images").glob("*.jpg"))
                       + list((data_root / "images").glob("*.png")))
    mask_paths = sorted((data_root / "masks").glob("*.png"))

    rows = []
    for index, (img_path, mask_path) in enumerate(zip(img_paths, mask_paths)):
        img = cv2.imread(str(img_path))
        mask = cv2.imread(str(mask_path), cv2.IMREAD_GRAYSCALE)
        h, w = mask.shape
        img = np.pad(img, ((0, -h % patch_size), (0, -w % patch_size),
                           (0, 0)))
        mask = np.pad(mask, ((0, -h % patch_size), (0, -w % patch_size)))
        for gy, gx in product(range(img.shape[0] // patch_size),
                              range(img.shape[1] // patch_size)):
            y, x = gy * patch_size, gx * patch_size
            cell = (slice(y, y + patch_size), slice(x, x + patch_size))
            cv2.imwrite(str(output_dir / "images" / f"{index}-{x}-{y}.jpg"),
                        img[cell])
            cv2.imwrite(str(output_dir / "masks" / f"{index}-{x}-{y}.png"),
                        mask[cell])
        rows.append((img_path.stem, h, w))

    with open(output_dir / "info.csv", "w") as fp:
        csv.writer(fp).writerows(rows)
    return output_dir


def oa(P, G):
    return (P == G).mean()


def dice(S, G, epsilon=1e-7):
    S, G = S > 0, G > 0
    return 2 * (G * S).sum() / (G.sum() + S.sum() + epsilon)


def combine_single(patches, original_size):
    height, width = original_size
    patch_size = cv2.imread(str(patches[0])).shape[0]
    ext_height = math.ceil(height / patch_size) * patch_size
    ext_width = math.ceil(width / patch_size) * patch_size
    final = np.zeros((ext_height, ext_width))
    for patch_path in patches:
        patch = cv2.imread(str(patch_path), cv2.IMREAD_GRAYSCALE)
        _, x, y = patch_path.name.replace(patch_path.suffix, "").split("-")
        final[int(y):int(y) + patch_size, int(x):int(x) + patch_size] = patch
    return final[:height, :width]


def compute_metrics(executor, predictions, gts, negative=False):
    if negative:
        predictions = [(255 - p) for p in predictions]
        gts = [(255 - g) for g in gts]
    pairs = list(zip(predictions, gts))
    print("Accuracy:", np.mean(executor(delayed(oa)(p, g) for p, g in pairs)))
    print("Dice:", np.mean(executor(delayed(dice)(p, g) for p, g in pairs)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("data_root")
    parser.add_argument("-m", "--model", default="wesup",
                        choices=["fcn", "cdws", "wesup", "sizeloss"])
    parser.add_argument("--pixel", action="store_true", default=False)
    parser.add_argument("--skip-infer", action="store_true", default=False)
    parser.add_argument("-p", "--patch-size", type=int, default=1000)
    parser.add_argument("-c", "--checkpoint", required=True)
    args = parser.parse_args()
    print(args)

    data_root = Path(args.data_root).expanduser()
    print("\nSplitting patches ...")
    patch_dir = split_patches(data_root, args.patch_size)

    ckpt_path = Path(args.checkpoint).expanduser()
    results_dir = ckpt_path.parent.parent / f"results-for-{ckpt_path.name}"

    if not args.skip_infer:
        if results_dir.exists():
            rmtree(str(results_dir))
        results_dir.mkdir(exist_ok=True)
        print("\nMaking inference ...")
        if args.model == "wesup" and args.pixel:
            from pixel_infer import main as pixel_infer

            pixel_infer(str(patch_dir), checkpoint=str(ckpt_path),
                        scales=(0.4,), output=str(results_dir))
        else:
            from infer import main as infer_main

            infer_main(str(patch_dir), model_type=args.model,
                       checkpoint=str(ckpt_path), input_size=(400, 400),
                       output_dir=str(results_dir))

    tag = "combined-results-pixel" if args.pixel else "combined-results"
    output_dir = results_dir.parent / f"{tag}-for-{ckpt_path.name}"
    output_dir.mkdir(exist_ok=True)

    with open(patch_dir / "info.csv") as fp:
        info = [(stem, int(h), int(w)) for stem, h, w in csv.reader(fp)]

    print("\nCombining predictions ...")
    for index, (stem, height, width) in enumerate(info):
        patches = list(results_dir.glob(f"{index}-*"))
        combined = combine_single(patches, (height, width))
        cv2.imwrite(str(output_dir / f"{stem}.png"), combined)
    print(f"Combined results saved to {output_dir}.")

    executor = Parallel(2)
    gt_dir = data_root / "masks"

    def read_mask(p):
        return cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)

    print("\nEvaluating positive OA and Dice ...")
    pos = executor(delayed(read_mask)(p)
                   for p in sorted(output_dir.glob("positive-*.png")))
    pos_gts = executor(delayed(read_mask)(p)
                       for p in sorted(gt_dir.glob("positive-*.png")))
    compute_metrics(executor, pos, pos_gts, negative=False)

    print("\nEvaluating negative OA and Dice ...")
    neg = executor(delayed(read_mask)(p)
                   for p in sorted(output_dir.glob("negative-*.png")))
    neg_gts = executor(delayed(read_mask)(p)
                       for p in sorted(gt_dir.glob("negative-*.png")))
    compute_metrics(executor, neg, neg_gts, negative=True)


if __name__ == "__main__":
    main()
