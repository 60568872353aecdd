"""Generate area.csv (foreground-pixel ratio per mask) for CWDS-MIL workflows
(parity with reference scripts/generate_area.py)."""

import argparse
import os
import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).parent))
from _common import imread_gray  # noqa: E402


def main():
    parser = argparse.ArgumentParser("Area information generator.")
    parser.add_argument("root_dir")
    args = parser.parse_args()

    mask_dir = Path(args.root_dir) / "masks"
    if not mask_dir.exists():
        print("Cannot generate area information without masks.")
        sys.exit(1)

    rows = []
    for img_name in sorted(os.listdir(mask_dir)):
        img = imread_gray(mask_dir / img_name)
        rows.append({"img": img_name, "area": float(img.mean())})

    output_path = Path(args.root_dir) / "area.csv"
    pd.DataFrame(rows).to_csv(output_path)
    print(f"Area information saved to {output_path}.")


if __name__ == "__main__":
    main()
