"""Shuffle the MICCAI 2015 GlaS dataset into train/val/testA/testB layout
(parity with reference prepare_glas.py): stratified split on tumor grade via
sklearn, masks binarized on copy."""

import argparse
import os
import warnings
from pathlib import Path
from shutil import copyfile

import cv2
import pandas as pd
from sklearn.model_selection import train_test_split

warnings.filterwarnings("ignore")


def split_train_val_test(orig_path, val_size=0.1):
    grade = pd.read_csv(Path(orig_path) / "Grade.csv")
    grade = grade.drop(grade.columns[1:3], axis=1)

    testA_set = grade[grade["name"].str.startswith("testA_")]["name"]
    testB_set = grade[grade["name"].str.startswith("testB_")]["name"]

    grade = grade[grade["name"].str.startswith("train_")]
    grade.columns = ("name", "grade")
    grade["grade"] = pd.factorize(grade["grade"])[0]

    x, y = grade["name"], grade["grade"]
    train_set, val_set, _, _ = train_test_split(x, y, test_size=val_size,
                                                stratify=y)
    return train_set, val_set, testA_set, testB_set


def prepare_images(orig_path, dst_path, names):
    dst_path = Path(dst_path)
    dst_img_dir = dst_path / "images"
    dst_mask_dir = dst_path / "masks"
    for d in (dst_path, dst_img_dir, dst_mask_dir):
        d.mkdir(parents=True, exist_ok=True)

    for name in names:
        img_name = f"{name}.bmp"
        mask_name = f"{name}_anno.bmp"
        copyfile(Path(orig_path) / img_name, dst_img_dir / img_name)
        mask = cv2.imread(str(Path(orig_path) / mask_name),
                          cv2.IMREAD_GRAYSCALE)
        cv2.imwrite(str(dst_mask_dir / img_name),
                    (mask > 0).astype("uint8"))


def main():
    parser = argparse.ArgumentParser("Dataset generator for GlaS challenge.")
    parser.add_argument("dataset_path",
                        help="Path to original MICCAI 2015 GlaS dataset.")
    parser.add_argument("--val-size", type=float, default=0.1)
    parser.add_argument("-o", "--output", default="data")
    args = parser.parse_args()

    train_set, val_set, testA_set, testB_set = split_train_val_test(
        args.dataset_path, args.val_size)

    os.makedirs(args.output, exist_ok=True)
    for subdir, names in [("train", train_set), ("val", val_set),
                          ("testA", testA_set), ("testB", testB_set)]:
        prepare_images(args.dataset_path, Path(args.output) / subdir, names)
        print(f"{subdir} data is done.")


if __name__ == "__main__":
    main()
