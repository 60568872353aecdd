"""Grid-search SLIC parameters by superpixel-oracle accuracy.

Parity with reference scripts/search_slic_params.py:30-69: for each
(sp_area, compactness) pair, compute the accuracy an oracle would reach by
painting every superpixel with its mask majority vote.

TPU-native twist: the clustering runs through wesup_tpu.ops.slic on the
default JAX device — on a TPU this searches the whole grid orders of
magnitude faster than the reference's joblib CPU pool.
"""

import argparse
import sys
from itertools import product
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from _common import imread_gray, imread_rgb, list_images  # noqa: E402


def oracle_accuracy(img_u8, mask, sp_area, compactness):
    import jax.numpy as jnp

    from wesup_tpu.ops.slic import n_clusters, slic

    h, w = img_u8.shape[:2]
    seg = np.asarray(slic(jnp.asarray(img_u8.astype(np.float32) / 255.0),
                          sp_area=int(sp_area), compactness=float(compactness)))
    K = n_clusters(h, w, int(sp_area))
    flat_seg = seg.reshape(-1)
    flat_mask = mask.reshape(-1).astype(np.float64)
    sums = np.bincount(flat_seg, weights=flat_mask, minlength=K)
    cnts = np.bincount(flat_seg, minlength=K)
    votes = np.round(sums / np.maximum(cnts, 1))
    oracle = votes[flat_seg]
    return float((oracle == flat_mask).mean())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset_path", help="Path with images/ and masks/")
    parser.add_argument("-r", "--rescale-factor", type=float, default=0.5)
    parser.add_argument("-a", "--area", default="50,60,70,80,90,100")
    parser.add_argument("-c", "--compactness", default="10,20,30,40,50")
    args = parser.parse_args()

    import cv2

    print("Reading images and masks ...")
    imgs, masks = [], []
    for ip, mp in zip(list_images(Path(args.dataset_path) / "images"),
                      list_images(Path(args.dataset_path) / "masks")):
        img = imread_rgb(ip)
        tw = int(img.shape[1] * args.rescale_factor)
        th = int(img.shape[0] * args.rescale_factor)
        imgs.append(cv2.resize(img, (tw, th), interpolation=cv2.INTER_LINEAR))
        masks.append(cv2.resize(imread_gray(mp), (tw, th),
                                interpolation=cv2.INTER_NEAREST))

    areas = [int(n) for n in str(args.area).split(",")]
    compactnesses = [int(n) for n in str(args.compactness).split(",")]
    for area, compactness in product(areas, compactnesses):
        accs = [oracle_accuracy(img, mask, area, compactness)
                for img, mask in zip(imgs, masks)]
        print(f"# Segments = {area}, Compactness = {compactness}, "
              f"Acc = {np.mean(accs):.4f}")


if __name__ == "__main__":
    main()
