"""Training entry point (CLI parity with reference train.py).

Usage:
    python train.py /path/to/dataset [model=wesup] [epochs=300] [smoke=True]
                    [metrics=accuracy,dice,object_dice] [platform=cpu] ...

``platform=`` pins the JAX backend ('axon' = the TPU tunnel, 'cpu'), the
analogue of the reference's ``device`` option (reference train.py:30).

``metrics=`` selects evaluation metrics by name (reference train.py:26-27
passes the function objects [accuracy, dice]; that remains the effective
default — accuracy/dice run on device inside the jitted eval step).  Extra
names (e.g. ``object_dice``, ``detection_f1``) are evaluated host-side on
the validation predictions and land in history.csv as ``val_<name>``.

The dataset directory must contain ``train/`` (and optionally ``val/``) with
``images/``, ``masks/`` and optionally ``points/`` subdirectories.
"""

import logging
from shutil import rmtree

from wesup_tpu import cli
from wesup_tpu.models import initialize_trainer


def fit(dataset_path, model="wesup", **kwargs):
    logger = logging.getLogger("Train")
    logger.setLevel(logging.DEBUG)
    if not logger.handlers:
        logger.addHandler(logging.StreamHandler())

    trainer = initialize_trainer(model, logger=logger, **kwargs)

    try:
        trainer.train(dataset_path, **kwargs)
    finally:
        if kwargs.get("smoke") and trainer.record_dir is not None:
            rmtree(trainer.record_dir, ignore_errors=True)


if __name__ == "__main__":
    cli.run(fit)
