"""GlaS test-set inference driver (parity with reference test_glas.py):
checkpoint -> multi-scale superpixel inference over testA/testB, default
scales (0.6, 0.55, 0.5, 0.45, 0.4)."""

import argparse
from pathlib import Path

from infer import infer
from wesup_tpu.models import initialize_trainer

DEFAULT_DATA_ROOT = Path.home() / "data" / "GLAS_all"
SPLITS = ("testA", "testB")


def test(ckpt_path, model_type="wesup", input_size=None, scales=(0.5,),
         data_root=None, **kwargs):
    ckpt_path = Path(ckpt_path)
    trainer = initialize_trainer(model_type, **kwargs)
    trainer.load_checkpoint(ckpt_path)

    # fixed-size runs land in results/, multi-scale in results-<n>scale/
    # (reference test_glas.py:22-27)
    record_dir = ckpt_path.parent.parent
    suffix = "" if input_size is not None else f"-{len(scales)}scale"
    results_dir = record_dir / f"results{suffix}"
    results_dir.mkdir(exist_ok=True)

    data_root = Path(data_root) if data_root else DEFAULT_DATA_ROOT
    for split in SPLITS:
        print(f"\nTesting on test set {split[-1]} ...")
        infer(trainer, data_root / split, results_dir / split,
              input_size=input_size, scales=scales)


def _cli():
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model", default="wesup")
    parser.add_argument("--input-size")
    parser.add_argument("--scales", default="0.6,0.55,0.5,0.45,0.4")
    parser.add_argument("-c", "--checkpoint", required=True)
    parser.add_argument("--data-root", default=None,
                        help="GlaS root with testA/ and testB/ "
                             "(default ~/data/GLAS_all)")
    args = parser.parse_args()

    size = [int(s) for s in args.input_size.split(",")] \
        if args.input_size is not None else None
    return args, size, tuple(float(s) for s in args.scales.split(","))


if __name__ == "__main__":
    args, input_size, scales = _cli()
    test(args.checkpoint, model_type=args.model, input_size=input_size,
         scales=scales, data_root=args.data_root)
