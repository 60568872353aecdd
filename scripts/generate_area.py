"""Generate area.csv (foreground-pixel ratio per mask) for CWDS-MIL workflows
(parity with reference scripts/generate_area.py — same on-disk CSV layout)."""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from _common import imread_gray  # noqa: E402


def measure_areas(mask_dir: Path):
    """DataFrame of per-mask mean pixel value, one row per file (sorted)."""
    import pandas as pd

    names = sorted(os.listdir(mask_dir))
    means = [float(imread_gray(mask_dir / n).mean()) for n in names]
    return pd.DataFrame({"img": names, "area": means})


def main():
    parser = argparse.ArgumentParser("Area information generator.")
    parser.add_argument("root_dir")
    args = parser.parse_args()

    root = Path(args.root_dir)
    if not (root / "masks").exists():
        print("Cannot generate area information without masks.")
        sys.exit(1)

    out = root / "area.csv"
    measure_areas(root / "masks").to_csv(out)
    print(f"Area information saved to {out}.")


if __name__ == "__main__":
    main()
