"""Training entry point (CLI parity with reference train.py).

Usage:
    python train.py /path/to/dataset [model=wesup] [epochs=300] [smoke=True] ...

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
