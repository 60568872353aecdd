"""Pixel-wise inference CLI (parity with reference pixel_infer.py).

Usage:
    python pixel_infer.py <data_root> checkpoint=<ckpt> [scales=0.5] [output=...]

Note: the reference's ``__main__`` crashes on an undefined ``device``
variable (pixel_infer.py:78-79); that bug is fixed here, everything else is
behavior-parity.
"""

from pathlib import Path

import cv2

from wesup_tpu import cli
from wesup_tpu.inference import Predictor, predict_multiscale
from wesup_tpu.models import initialize_trainer


def main(data_root, checkpoint=None, output=None, scales=(0.5,), **kwargs):
    if not isinstance(scales, (tuple, list)):
        scales = (scales,)
    data_root = Path(data_root).expanduser()
    if output is not None:
        output_dir = Path(output).expanduser()
    elif checkpoint is not None:
        scale_tag = ",".join(str(s) for s in scales)
        output_dir = (Path(checkpoint).expanduser().parent.parent /
                      f"results-pixel-{scale_tag}" / data_root.name)
    else:
        output_dir = Path("predictions")
    output_dir.mkdir(parents=True, exist_ok=True)

    trainer = initialize_trainer("wesup", **kwargs)
    if checkpoint is not None:
        trainer.load_checkpoint(checkpoint)
    predictor = Predictor(trainer.params, trainer.config, mode="pixel",
                          mesh=trainer.mesh)

    img_paths = sorted((data_root / "images").iterdir())
    for img_path in img_paths:
        img = cv2.cvtColor(cv2.imread(str(img_path)), cv2.COLOR_BGR2RGB)
        pred = predict_multiscale(predictor, img, scales=scales)
        out_name = img_path.name.replace(".jpg", ".png")
        cv2.imwrite(str(output_dir / out_name),
                    pred.astype("uint8") * 255)


if __name__ == "__main__":
    cli.run(main)
