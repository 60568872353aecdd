"""Full GlaS-protocol quality run on synthetic data (easy or hard).

The committed driver behind the README quality tables.  One run:

  1. build a synthetic GlaS-scale dataset (tests/make_dataset.py) with
     held-out testA/testB splits — ``--hard`` uses the non-color-separable
     gland generator (lobed touching glands, lumina, dark rims, stromal
     nucleus distractors; a best-single-threshold color rule tops out at
     Dice ~0.8 there, vs 1.0 on the easy blobs);
  2. generate reference-protocol point annotations over the train masks
     (scripts/generate_points.py, point_ratio 1e-4 — the reference
     README's default weak-label density);
  3. train the full weak-label method (on-device SLIC + propagation loss)
     for --epochs;
  4. run the complete GlaS test protocol: test_glas.py 5-scale superpixel
     inference + morphological opening, then evaluate_glas.py <2000 px
     region flip + contest metrics (reference test_glas.py:48,
     infer.py:84-92, evaluate_glas.py:29-42);
  5. print per-split mean Accuracy / Dice / Detection F1 / Object Dice /
     Object Hausdorff and write a JSON summary.

Usage:
    python scripts/quality_protocol.py [--hard] [--epochs 150] [--out F]
"""

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

SCALES = (0.6, 0.55, 0.5, 0.45, 0.4)


def build_dataset(args):
    from make_dataset import make_dataset

    root = Path(args.root)
    if not (root / "train" / "images").exists():
        make_dataset(root, n_train=args.n_train, n_val=args.n_val,
                     hw=tuple(args.hw), seed=args.seed, with_points=False,
                     hard=args.hard, n_testA=args.n_test, n_testB=args.n_test)
        subprocess.run(
            [sys.executable, str(REPO / "scripts" / "generate_points.py"),
             str(root / "train"), "--seed", str(args.seed)],
            check=True)
        (root / "train" / "points-0.0001").rename(root / "train" / "points")
    return root


def train(root, args, overrides):
    import pandas as pd

    from wesup_tpu.models import initialize_trainer

    os.environ["RECORD_ROOT"] = str(Path(args.root) / "records")
    # only the final checkpoint is needed for the test protocol; per-epoch
    # 151 MB writes saturate this host's single core/slow disk (PERF_NOTES
    # item 23), so skip intermediates
    kwargs = dict(epochs=args.epochs, seed=0, checkpoint_period=args.epochs)
    kwargs.update(overrides)  # lets --set seed=1 override the pinned default
    trainer = initialize_trainer("wesup", **kwargs)
    trainer.train(str(root), epochs=args.epochs)
    hist = pd.read_csv(trainer.record_dir / "history.csv")
    return trainer.record_dir, float(hist["val_dice"].max()), \
        float(hist["val_dice"].to_numpy()[-1])


def _jsonable(v):
    # params/<n>.json round-trips tuples as lists (record.save_params)
    return list(v) if isinstance(v, tuple) else v


def find_reusable_record(args, overrides):
    """Newest record under --root whose params snapshot equals the config
    this invocation would train with AND whose final checkpoint exists —
    lets a sweep interrupted after training (e.g. a TPU worker crash in the
    test phase) resume without re-burning the 250-epoch runs."""
    from dataclasses import asdict

    from wesup_tpu.config import WESUPConfig

    want = {k: _jsonable(v) for k, v in asdict(WESUPConfig()).items()}
    want.update({"epochs": args.epochs, "seed": 0,
                 "checkpoint_period": args.epochs})
    want.update({k: _jsonable(v) for k, v in overrides.items()})
    records = Path(args.root) / "records"
    for d in sorted(records.glob("*"), reverse=True) if records.exists() else []:
        pj, hist = d / "params" / "0.json", d / "history.csv"
        ck = d / "checkpoints" / f"ckpt.{args.epochs:04d}.msgpack"
        if not (pj.exists() and ck.exists() and hist.exists()):
            continue
        got = json.loads(pj.read_text())
        if ({k: got.get(k) for k in want} == want
                and sum(1 for _ in open(hist)) >= args.epochs + 1):
            return d
    return None


def run_test_protocol(record_dir, root):
    from test_glas import test

    ckpt = sorted((record_dir / "checkpoints").glob("ckpt.*"))[-1]
    test(str(ckpt), scales=SCALES, data_root=str(root))
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "evaluate_glas.py"),
         str(record_dir / f"results-{len(SCALES)}scale"),
         "--gt-root", str(root), "--ext", "png"],
        check=True, capture_output=True, text=True)
    print(out.stdout)
    results = {}
    split = None
    for line in out.stdout.splitlines():
        if line.strip() in ("testA", "testB"):
            split = line.strip()
            results[split] = {}
        m = re.match(r"(Accuracy|Dice|Detection F1|Object Dice|"
                     r"Object Hausdorff): ([\d.nan]+)", line.strip())
        if m and split:
            results[split][m.group(1)] = float(m.group(2))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hard", action="store_true")
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--n-train", type=int, default=20)
    ap.add_argument("--n-val", type=int, default=4)
    ap.add_argument("--n-test", type=int, default=6)
    ap.add_argument("--hw", type=int, nargs=2, default=(522, 775))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--root", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--set", action="append", default=[],
                    help="config override, e.g. --set slic_update_stride=3 "
                         "(value parsed as JSON)")
    ap.add_argument("--reuse-record", default=None,
                    help="skip training: run the test protocol against this "
                         "existing record dir (its history.csv supplies the "
                         "val-dice fields); 'auto' finds a record whose "
                         "params match this invocation's config")
    args = ap.parse_args()
    variant = "hard" if args.hard else "easy"
    if args.root is None:
        args.root = f"/tmp/quality_protocol_{variant}"
    if args.out is None:
        args.out = f"/tmp/quality_protocol_{variant}.json"

    t0 = time.time()
    root = build_dataset(args)
    overrides = {}
    for kv in args.set or []:
        k, v = kv.split("=", 1)
        overrides[k] = json.loads(v)
    if args.reuse_record == "auto":
        args.reuse_record = find_reusable_record(args, overrides)
        if args.reuse_record is None:
            print("[protocol] no reusable record found; training",
                  file=sys.stderr)
    if args.reuse_record:
        import pandas as pd

        record_dir = Path(args.reuse_record)
        hist = pd.read_csv(record_dir / "history.csv")
        best_val = float(hist["val_dice"].max())
        final_val = float(hist["val_dice"].to_numpy()[-1])
        print(f"[protocol] reusing trained record {record_dir}: best val "
              f"Dice {best_val:.4f}, final {final_val:.4f}", file=sys.stderr)
    else:
        record_dir, best_val, final_val = train(root, args, overrides)
        print(f"[protocol] trained {args.epochs} epochs: best val Dice "
              f"{best_val:.4f}, final {final_val:.4f} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr)
    results = run_test_protocol(record_dir, root)

    summary = {"variant": variant, "epochs": args.epochs,
               "best_val_dice": best_val, "final_val_dice": final_val,
               "splits": results, "wall_s": round(time.time() - t0, 1),
               "record_dir": str(record_dir)}
    Path(args.out).write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
