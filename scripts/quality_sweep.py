"""Hyperparameter sweep over the committed hard quality protocol.

VERDICT r3 observed that hard-task val Dice plateaus at ~0.78 while the SLIC
oracle sits at 0.981 — the classifier/propagation is the limit, not the
superpixels — and that no sweep of the method's own knobs
(propagate_threshold, sp_area; reference models/wesup.py:158-165) existed.
This driver turns those levers: it runs scripts/quality_protocol.py --hard
once per config (sequentially — ONE TPU process at a time on this box) and
tabulates best-val/test Dice against the committed defaults
(artifacts/qp_hard_250_stride3.json: threshold 0.8, sp_area 200,
test Dice 0.8335/0.8218 A/B).

Usage:
    python scripts/quality_sweep.py [--epochs 250] [--out artifacts/...]
        [--configs "propagate_threshold=0.6;propagate_threshold=0.7;..."]

Each config is a ';'-separated list of comma-separated key=value overrides.
"""

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

DEFAULT_CONFIGS = [
    "propagate_threshold=0.6",
    "propagate_threshold=0.7",
    "propagate_threshold=0.9",
    "sp_area=100",
    "sp_area=400",
]


def run_one(config: str, epochs: int, root: str) -> dict:
    tag = config.replace("=", "").replace(",", "_").replace(".", "")
    out = f"/tmp/qp_sweep_{tag}.json"
    cmd = [sys.executable, str(REPO / "scripts" / "quality_protocol.py"),
           "--hard", "--epochs", str(epochs), "--root", root, "--out", out,
           # resume a crash-interrupted sweep: a config whose 250-epoch
           # training survived (matching params/0.json + final checkpoint)
           # skips straight to the test protocol
           "--reuse-record", "auto"]
    for kv in config.split(","):
        cmd += ["--set", kv]
    print(f"[sweep] {config}: {' '.join(cmd)}", file=sys.stderr, flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        print(proc.stdout[-2000:], file=sys.stderr)
        print(proc.stderr[-2000:], file=sys.stderr)
        return {"config": config, "error": proc.returncode}
    summary = json.loads(Path(out).read_text())
    summary["config"] = config
    summary["sweep_wall_s"] = round(time.time() - t0, 1)
    print(f"[sweep] {config}: best val {summary['best_val_dice']:.4f} "
          f"test Dice A/B "
          f"{summary['splits'].get('testA', {}).get('Dice', float('nan')):.4f}/"
          f"{summary['splits'].get('testB', {}).get('Dice', float('nan')):.4f} "
          f"({summary['sweep_wall_s']:.0f}s)", file=sys.stderr, flush=True)
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=250)
    ap.add_argument("--configs", default=";".join(DEFAULT_CONFIGS))
    ap.add_argument("--root", default="/tmp/quality_protocol_hard")
    ap.add_argument("--out", default=str(REPO / "artifacts" /
                                         "qp_hard_sweep.json"))
    args = ap.parse_args()

    results = []
    for config in args.configs.split(";"):
        config = config.strip()
        if not config:
            continue
        results.append(run_one(config, args.epochs, args.root))
        # checkpoint the sweep after every run so a crash loses nothing
        Path(args.out).write_text(json.dumps(
            {"epochs": args.epochs, "runs": results}, indent=2))
    print(json.dumps({"epochs": args.epochs, "runs": results}, indent=2))


if __name__ == "__main__":
    main()
