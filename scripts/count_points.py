"""Average point count per annotation CSV (parity with reference
scripts/count_points.py)."""

import argparse
import glob
import os

import numpy as np
import pandas as pd

parser = argparse.ArgumentParser()
parser.add_argument("points_path", help="Path to point annotations")
args = parser.parse_args()

print(np.mean([len(pd.read_csv(f))
               for f in glob.glob(os.path.join(args.points_path, "*.csv"))]))
