"""Offline PD-L1 evaluation (parity with reference scripts/evaluate_pdl1.py):
identical to the CRAG evaluator with a 5000 px threshold and a different
(author-specific, here overridable) GT root."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

if __name__ == "__main__":
    import argparse

    import evaluate_crag

    # same pipeline; default GT root differs (reference evaluate_pdl1.py:73)
    parser = argparse.ArgumentParser()
    parser.add_argument("pred_root")
    parser.add_argument("--gt-root", default=str(Path("~/data/PDL1/test/masks")))
    parser.add_argument("--threshold", type=int, default=5000)
    args = parser.parse_args()

    sys.argv = ["evaluate_crag", args.pred_root, "--gt-root", args.gt_root,
                "--threshold", str(args.threshold)]
    evaluate_crag.main()
