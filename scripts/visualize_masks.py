"""Save binary masks as viewable x255 images (parity with reference
scripts/visualize_masks.py)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from _common import imread_gray, imsave, list_images  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("mask_root", help="Path to mask directory")
    parser.add_argument("-o", "--output")
    args = parser.parse_args()

    mask_root = Path(args.mask_root)
    output_dir = (Path(args.output) if args.output
                  else mask_root.parent / "viz")
    output_dir.mkdir(exist_ok=True)

    for mask_path in list_images(mask_root):
        imsave(output_dir / mask_path.name, imread_gray(mask_path) * 255)


if __name__ == "__main__":
    main()
