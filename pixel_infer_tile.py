"""Tiled pixel-wise inference CLI (parity with reference pixel_infer_tile.py).

Usage:
    python pixel_infer_tile.py <data_root> checkpoint=<ckpt> [patch_size=300]
                               [output=...]

This is the CRAG large-image path (README patch size 400).  Stitched
probability averages are ROUNDED before saving (pixel_infer_tile.py:58-60),
unlike the truncating superpixel tile path.
"""

from pathlib import Path

import cv2

from wesup_tpu import cli
from wesup_tpu.inference import Predictor, predict_tiled
from wesup_tpu.models import initialize_trainer


def main(data_root, checkpoint=None, patch_size=300, output=None, chunk=8,
         **kwargs):
    data_root = Path(data_root).expanduser()
    if output is not None:
        output_dir = Path(output).expanduser()
    elif checkpoint is not None:
        output_dir = (Path(checkpoint).expanduser().parent.parent /
                      f"results-pixel-tile-{patch_size}" / data_root.name)
    else:
        output_dir = Path("predictions")
    output_dir.mkdir(parents=True, exist_ok=True)

    trainer = initialize_trainer("wesup", **kwargs)
    if checkpoint is not None:
        trainer.load_checkpoint(checkpoint)
    predictor = Predictor(trainer.params, trainer.config, mode="pixel",
                          mesh=trainer.mesh)

    print("Making inference ...")
    img_paths = sorted((data_root / "images").iterdir())
    for img_path in img_paths:
        img = cv2.cvtColor(cv2.imread(str(img_path)), cv2.COLOR_BGR2RGB)
        pred = predict_tiled(predictor, img, patch_size, chunk=chunk,
                             round_patches=False)
        cv2.imwrite(str(output_dir / img_path.name),
                    pred.round().astype("uint8") * 255)


if __name__ == "__main__":
    cli.run(main)
