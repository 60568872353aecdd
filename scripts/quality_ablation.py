"""Augmentation-divergence ablation over the full quality protocol.

SURVEY §7 hard-part 5 sets the acceptance for the augmentation stack as
"final Dice within 0.5%, document divergence".  The divergences vs the
reference's albumentations stack are documented (README); this driver
quantifies what each one actually COSTS by running the full training
protocol (synthetic GlaS-scale dataset, point supervision — the flagship
weak-label method) once per variant and comparing val Dice:

  point-mode variants (reference stack: utils/data.py:302-327 — no elastic):
    * baseline        — production defaults (cascade warp, SLIC stride 2)
    * warp_exact      — one-pass map_coordinates warp (no cascade lerp
                        composition divergence)
    * slic_stride1    — exact full-grid SLIC k-means (no stride-2 update
                        subsampling divergence)

  mask-mode variants (reference stack: utils/data.py:116-133 — elastic
  p=0.5; ours approximates albumentations' ElasticTransform with a
  coarse-field displacement):
    * mask_baseline   — elastic_p=0.5 (reference probability)
    * mask_no_elastic — elastic_p=0

Each run: identical data, identical seed, full trainer (jitted aug + SLIC +
forward + loss + SGD on the TPU), N epochs, per-epoch val Dice from
history.csv.  Output: a markdown table + JSON with final/best/breakthrough
epoch per variant.

Usage:
    python scripts/quality_ablation.py [--epochs 120] [--out FILE.json]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

POINT_VARIANTS = {
    "baseline": {},
    "warp_exact": {"warp_method": "exact"},
    "slic_stride1": {"slic_update_stride": 1},
    "slic_stride3": {"slic_update_stride": 3},
}
MASK_VARIANTS = {
    "mask_baseline": {"elastic_p": 0.5},
    "mask_no_elastic": {"elastic_p": 0.0},
}


def run_variant(name, overrides, data_root, epochs, record_root):
    import pandas as pd

    from wesup_tpu.models import initialize_trainer

    os.environ["RECORD_ROOT"] = str(Path(record_root) / name)
    t0 = time.time()
    trainer = initialize_trainer("wesup", epochs=epochs, seed=0,
                                 checkpoint_period=0, **overrides)
    trainer.train(str(data_root), epochs=epochs)
    hist = pd.read_csv(trainer.record_dir / "history.csv")
    dice = hist["val_dice"].to_numpy()
    breakthrough = next((int(e) + 1 for e, d in enumerate(dice) if d > 0.9),
                        None)
    row = {
        "variant": name,
        "final_dice": float(dice[-1]),
        "best_dice": float(dice.max()),
        "mean_last10": float(dice[-10:].mean()),
        "breakthrough_epoch": breakthrough,
        "wall_s": round(time.time() - t0, 1),
    }
    print(f"[ablation] {name}: {row}", file=sys.stderr, flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--n-train", type=int, default=20)
    ap.add_argument("--n-val", type=int, default=4)
    ap.add_argument("--hw", type=int, nargs=2, default=(522, 775),
                    help="raw image size; trainer rescales by 0.5")
    ap.add_argument("--root", default="/tmp/quality_ablation")
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to run")
    ap.add_argument("--out", default="/tmp/quality_ablation.json")
    args = ap.parse_args()

    from make_dataset import make_dataset

    root = Path(args.root)
    point_ds = root / "point_ds"
    mask_ds = root / "mask_ds"
    if not (point_ds / "train" / "images").exists():
        make_dataset(point_ds, n_train=args.n_train, n_val=args.n_val,
                     hw=tuple(args.hw), seed=0)
    if not (mask_ds / "train" / "images").exists():
        make_dataset(mask_ds, n_train=args.n_train, n_val=args.n_val,
                     hw=tuple(args.hw), seed=0, with_points=False)

    only = set(args.only.split(",")) if args.only else None
    rows = []
    for name, ov in POINT_VARIANTS.items():
        if only is None or name in only:
            rows.append(run_variant(name, ov, point_ds, args.epochs,
                                    root / "records"))
    for name, ov in MASK_VARIANTS.items():
        if only is None or name in only:
            rows.append(run_variant(name, ov, mask_ds, args.epochs,
                                    root / "records"))

    print("| variant | final val Dice | best | mean(last 10) | "
          "breakthrough epoch | wall s |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['variant']} | {r['final_dice']:.4f} | "
              f"{r['best_dice']:.4f} | {r['mean_last10']:.4f} | "
              f"{r['breakthrough_epoch']} | {r['wall_s']} |")
    Path(args.out).write_text(json.dumps(rows, indent=2))
    print(f"-> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
