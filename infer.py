"""Superpixel-wise inference CLI (parity with reference infer.py).

Usage:
    python infer.py <data_dir> checkpoint=<ckpt> [scales=0.6,0.55,0.5,0.45,0.4]
                    [output_dir=...] [input_size=...]
"""

from pathlib import Path

import cv2
import numpy as np

from wesup_tpu import cli
from wesup_tpu.data.datasets import SegmentationDataset
from wesup_tpu.inference import Predictor, predict_multiscale_batch
from wesup_tpu.models import initialize_trainer


def save_predictions(predictions, dataset, output_dir="predictions"):
    """Save binary predictions as {0, 255} PNGs (reference infer.py:99-116)."""
    print(f"\nSaving prediction to {output_dir} ...")
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    for pred, img_path in zip(predictions, dataset.img_paths):
        out = (pred.astype("uint8")) * 255
        cv2.imwrite(str(output_dir / f"{img_path.stem}.png"), out)


def infer(trainer, data_dir, output_dir=None, input_size=None, scales=(0.5,),
          **_):
    dataset = SegmentationDataset(data_dir, train=False)
    predictor = Predictor(trainer.params, trainer.config, mode="superpixel",
                          mesh=trainer.mesh)

    size_info = (f"input size {input_size}" if input_size
                 else f"scales {scales}")
    print(f"\nPredicting {len(dataset)} images with {size_info} ...")

    imgs = [
        cv2.cvtColor(cv2.imread(str(dataset.img_paths[dataset.picked[i]])),
                     cv2.COLOR_BGR2RGB)
        for i in range(len(dataset))
    ]
    predictions = predict_multiscale_batch(predictor, imgs, scales=scales,
                                           input_size=input_size)

    if output_dir is not None:
        save_predictions(predictions, dataset, output_dir)
    return predictions


def main(data_dir, model_type="wesup", checkpoint=None, output_dir=None,
         input_size=None, scales=(0.5,), **kwargs):
    if not isinstance(scales, (tuple, list)):
        scales = (scales,)
    if output_dir is None and checkpoint is not None:
        output_dir = Path(checkpoint).parent.parent / "results"
        output_dir.mkdir(parents=True, exist_ok=True)

    trainer = initialize_trainer(model_type, **kwargs)
    if checkpoint is not None:
        trainer.load_checkpoint(checkpoint)

    infer(trainer, data_dir, output_dir, input_size=input_size, scales=scales)


if __name__ == "__main__":
    cli.run(main)
