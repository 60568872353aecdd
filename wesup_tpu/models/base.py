"""Trainer framework: epoch loop, checkpointing, records, logging.

Behavioral parity with the reference's ``BaseTrainer`` (models/base.py:39-360):
same record-dir layout, same history.csv, same per-epoch checkpoint cadence
with latest-only retention (models/base.py:323-331), same resume semantics
(``--checkpoint`` restores epoch+1 / params / optimizer state,
models/base.py:124-148), same exception policy (RuntimeError per-iteration
swallow, models/base.py:234-237; NaN-loss ValueError abort,
models/base.py:202-203).

State is a functional JAX pytree (params, opt_state) rather than mutable
modules; checkpoints are msgpack via flax.serialization, with a converter
accepting the reference's torch ``.pth`` files.
"""

from __future__ import annotations

import logging
import time
from abc import ABC, abstractmethod
from pathlib import Path

import numpy as np

from ..utils import record, underline
from ..utils.history import HistoryTracker


class BaseTrainer(ABC):
    def __init__(self, **kwargs):
        self.kwargs = kwargs

        if kwargs.get("logger"):
            self.logger = kwargs["logger"]
        else:
            self.logger = logging.getLogger("Train")
            self.logger.setLevel(logging.DEBUG)
            if not self.logger.handlers:
                self.logger.addHandler(logging.StreamHandler())

        self.initial_epoch = 1
        self.record_dir = None
        self.tracker = HistoryTracker()
        self.metric_names = ["accuracy", "dice"]

    # ------------------------------------------------------------------
    # subclass interface
    # ------------------------------------------------------------------

    @abstractmethod
    def get_default_dataset(self, root_dir, train=True, proportion=1.0):
        ...

    @abstractmethod
    def state_dict(self) -> dict:
        """Serializable training state (params, opt_state, ...)."""

    @abstractmethod
    def load_state_dict(self, state: dict):
        ...

    @abstractmethod
    def train_one_epoch(self, no_val: bool):
        ...

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------

    def load_checkpoint(self, ckpt_path=None):
        if ckpt_path is not None:
            ckpt_path = Path(ckpt_path)
            self.record_dir = ckpt_path.parent.parent
            self.logger.info(f"Loading checkpoint from {ckpt_path}.")
            if ckpt_path.suffix == ".pth":
                self._load_torch_checkpoint(ckpt_path)
            else:
                import flax.serialization as ser

                with open(ckpt_path, "rb") as fp:
                    payload = ser.msgpack_restore(fp.read())
                self.initial_epoch = int(payload["epoch"]) + 1
                self.load_state_dict(payload)
        else:
            self.record_dir = Path(record.prepare_record_dir())
            record.copy_source_files(self.record_dir)

    def _load_torch_checkpoint(self, ckpt_path):
        """Accept the reference's torch checkpoints (models/base.py:150-166).

        Model weights are converted; torch optimizer state is not portable
        and is reinitialized (logged)."""
        import torch

        payload = torch.load(ckpt_path, map_location="cpu",
                             weights_only=False)
        self.initial_epoch = int(payload.get("epoch", 0)) + 1
        self.load_torch_model_state(payload["model_state_dict"])
        self.logger.info(
            "Converted torch model weights; optimizer state reinitialized.")

    def load_torch_model_state(self, state_dict):
        raise NotImplementedError

    def save_checkpoint(self, ckpt_path, **extra):
        import flax.serialization as ser

        payload = {**self.state_dict(), **extra}
        ckpt_path = Path(ckpt_path)
        ckpt_path.parent.mkdir(parents=True, exist_ok=True)
        with open(ckpt_path, "wb") as fp:
            fp.write(ser.msgpack_serialize(payload))

    # ------------------------------------------------------------------
    # the training loop
    # ------------------------------------------------------------------

    def train(self, data_root, **kwargs):
        self.kwargs = {**self.kwargs, **kwargs}

        self.setup_optimizer()
        self.load_checkpoint(self.kwargs.get("checkpoint"))
        self.logger.addHandler(logging.FileHandler(self.record_dir / "train.log"))
        serializable = {
            k: v for k, v in self.kwargs.items()
            if isinstance(v, (int, float, str, tuple, bool))
        }
        record.save_params(self.record_dir, serializable)
        self.logger.info(str(serializable) + "\n")
        self.tracker.save_path = self.record_dir / "history.csv"

        data_root = Path(data_root)
        train_path = data_root / "train"
        val_path = data_root / "val"
        self.setup_dataloaders(train_path,
                               val_path if val_path.exists() else None,
                               proportion=self.kwargs.get("proportion", 1))

        self.logger.info(underline("\nTraining Stage", "="))
        epochs = int(self.kwargs.get("epochs"))
        total_epochs = epochs + self.initial_epoch - 1

        for epoch in range(self.initial_epoch, total_epochs + 1):
            self.logger.info(
                underline("\nEpoch {}/{}".format(epoch, total_epochs), "-"))
            self.tracker.start_new_epoch(self.current_lr())
            self._epoch_idx = epoch  # drives per-batch rng derivation
            self.train_one_epoch(no_val=not val_path.exists())
            self.post_epoch_hook(epoch)

            self.tracker.save()
            record.plot_learning_curves(self.tracker.save_path)

            ckpt_path = self.record_dir / "checkpoints" / f"ckpt.{epoch:04d}.msgpack"
            self.save_checkpoint(ckpt_path, epoch=epoch)
            for old in sorted((self.record_dir / "checkpoints").glob("ckpt.*"))[:-1]:
                old.unlink()

        self.logger.info(self.tracker.report())

    def post_epoch_hook(self, epoch):
        # reference builds an LR scheduler then discards it
        # (models/wesup.py:452-455), so this is intentionally a no-op
        pass

    def setup_optimizer(self):
        ...

    def current_lr(self) -> float:
        return float(self.kwargs.get("lr", 0.0))

    @abstractmethod
    def setup_dataloaders(self, train_path, val_path, proportion=1.0):
        ...

    # ------------------------------------------------------------------
    # evaluation helper (parity with models/base.py:335-360)
    # ------------------------------------------------------------------

    def evaluate_host(self, metric_funcs, preds, targets) -> dict:
        metrics = {}
        for func in metric_funcs:
            vals = [func(p, g) for p, g in zip(preds, targets)]
            metrics[func.__name__] = float(np.mean(vals))
        return metrics


def timed_phase(logger, name):
    class _Ctx:
        def __enter__(self):
            logger.info(f"{name.capitalize()} phase:")
            self.start = time.time()
            return self

        def __exit__(self, *exc):
            logger.info(f"Took {time.time() - self.start:.2f}s.")
            return False

    return _Ctx()
