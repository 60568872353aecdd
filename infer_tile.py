"""Tiled superpixel-wise inference CLI (parity with reference infer_tile.py).

Usage:
    python infer_tile.py <data_dir> checkpoint=<ckpt> [patch_size=464]
                         [output_dir=...]

Notes on reference quirks kept for behavior parity:
- stitched averages are saved with a uint8 *truncation* (infer_tile.py:141),
  so fractional overlap-averages of 0/1 patch predictions collapse to 0
  unless all overlapping windows agree;
- the reference default ``model_type='mild'`` is not supported by its own
  factory (infer_tile.py:164 vs models/__init__.py:16-17); we default to
  'wesup'.
"""

from pathlib import Path

import cv2

from wesup_tpu import cli
from wesup_tpu.inference import Predictor, predict_tiled
from wesup_tpu.models import initialize_trainer


def infer(trainer, data_dir, patch_size, output_dir=None, chunk=8):
    data_dir = Path(data_dir).expanduser()
    img_paths = sorted((data_dir / "images").iterdir())
    predictor = Predictor(trainer.params, trainer.config, mode="superpixel",
                          mesh=trainer.mesh)

    print(f"Predicting {len(img_paths)} images from {data_dir} ...")
    predictions = []
    for img_path in img_paths:
        img = cv2.cvtColor(cv2.imread(str(img_path)), cv2.COLOR_BGR2RGB)
        predictions.append(predict_tiled(predictor, img, patch_size,
                                         chunk=chunk, round_patches=True))

    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        print(f"\nSaving prediction to {output_dir} ...")
        for pred, img_path in zip(predictions, img_paths):
            cv2.imwrite(str(output_dir / img_path.name),
                        pred.astype("uint8") * 255)
    return predictions


def main(data_dir, model_type="wesup", patch_size=464, checkpoint=None,
         output_dir=None, chunk=8, **kwargs):
    if output_dir is None and checkpoint is not None:
        output_dir = Path(checkpoint).expanduser().parent.parent / "results"
        output_dir.mkdir(parents=True, exist_ok=True)

    trainer = initialize_trainer(model_type, **kwargs)
    if checkpoint is not None:
        trainer.load_checkpoint(checkpoint)
    infer(trainer, data_dir, patch_size, output_dir, chunk=chunk)


if __name__ == "__main__":
    cli.run(main)
