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
    img_dir = data_root / "images"
    mask_dir = data_root / "masks"
    img_paths = sorted(list(img_dir.glob("*.jpg")) + list(img_dir.glob("*.png")))
    mask_paths = sorted(mask_dir.glob("*.png"))

    output_dir = data_root.parent / f"{data_root.name}-patches"
    if output_dir.exists():
        print(f"{output_dir} found. Skipping.")
        return output_dir

    output_dir.mkdir(exist_ok=True)
    target_img_dir = output_dir / "images"
    target_mask_dir = output_dir / "masks"
    target_img_dir.mkdir(exist_ok=True)
    target_mask_dir.mkdir(exist_ok=True)

    def split(img, mask, index):
        height, width, channels = img.shape
        ext_height = math.ceil(height / patch_size) * patch_size
        ext_width = math.ceil(width / patch_size) * patch_size
        ext_img = np.zeros((ext_height, ext_width, channels), dtype=img.dtype)
        ext_mask = np.zeros((ext_height, ext_width), dtype=mask.dtype)
        ext_img[:height, :width] = img
        ext_mask[:height, :width] = mask

        # reference iterates range(0, dim + 1, patch) which emits an empty
        # patch when the padded dim is an exact multiple; guard it
        for x, y in product(range(0, width + 1, patch_size),
                            range(0, height + 1, patch_size)):
            if x >= ext_width or y >= ext_height:
                continue
            cv2.imwrite(str(target_img_dir / f"{index}-{x}-{y}.jpg"),
                        ext_img[y:y + patch_size, x:x + patch_size])
            cv2.imwrite(str(target_mask_dir / f"{index}-{x}-{y}.png"),
                        ext_mask[y:y + patch_size, x:x + patch_size])
        return height, width

    info = []
    for index, (img_path, mask_path) in enumerate(zip(img_paths, mask_paths)):
        img = cv2.imread(str(img_path))
        mask = cv2.imread(str(mask_path), cv2.IMREAD_GRAYSCALE)
        info.append((img_path.stem, *split(img, mask, index)))

    with open(output_dir / "info.csv", "w") as fp:
        csv.writer(fp).writerows(info)
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
