"""GlaS test-set inference driver (parity with reference test_glas.py):
checkpoint -> multi-scale superpixel inference over testA/testB, default
scales (0.6, 0.55, 0.5, 0.45, 0.4)."""

import argparse
from pathlib import Path

from infer import infer
from wesup_tpu.models import initialize_trainer


def test(ckpt_path, model_type="wesup", input_size=None, scales=(0.5,),
         data_root=None, **kwargs):
    ckpt_path = Path(ckpt_path)
    trainer = initialize_trainer(model_type, **kwargs)
    trainer.load_checkpoint(ckpt_path)

    record_dir = ckpt_path.parent.parent
    if input_size is not None:
        results_dir = record_dir / "results"
    else:
        results_dir = record_dir / f"results-{len(scales)}scale"
    results_dir.mkdir(exist_ok=True)

    data_root = Path(data_root) if data_root else Path.home() / "data" / "GLAS_all"

    print("\nTesting on test set A ...")
    infer(trainer, data_root / "testA", results_dir / "testA",
          input_size=input_size, scales=scales)

    print("\nTesting on test set B ...")
    infer(trainer, data_root / "testB", results_dir / "testB",
          input_size=input_size, scales=scales)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model", default="wesup")
    parser.add_argument("--input-size")
    parser.add_argument("--scales", default="0.6,0.55,0.5,0.45,0.4")
    parser.add_argument("-c", "--checkpoint", required=True)
    parser.add_argument("--data-root", default=None,
                        help="GlaS root with testA/ and testB/ "
                             "(default ~/data/GLAS_all)")
    args = parser.parse_args()

    input_size = None
    if args.input_size is not None:
        input_size = [int(s) for s in args.input_size.split(",")]
    scales = tuple(float(s) for s in args.scales.split(","))

    test(args.checkpoint, model_type=args.model, input_size=input_size,
         scales=scales, data_root=args.data_root)
