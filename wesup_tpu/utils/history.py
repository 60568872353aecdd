"""Per-epoch metric accumulation and CSV history.

Byte-compatible with the reference's ``HistoryTracker`` (utils/history.py):
same train/val key prefixing, same sorted-key csv layout with a trailing
``lr`` column, same last-N-epoch report format.
"""

from __future__ import annotations

import csv
import os
from collections import defaultdict

from . import underline


class HistoryTracker:
    def __init__(self, save_path=None):
        self.history = defaultdict(list)
        self.learning_rate = None
        self.save_path = save_path
        self.is_train = True

    def start_new_epoch(self, lr):
        self.history.clear()
        self.learning_rate = lr

    def train(self):
        self.is_train = True

    def eval(self):
        self.is_train = False

    def step(self, metrics: dict) -> str:
        reports = []
        for k, v in metrics.items():
            k = k if self.is_train else f"val_{k}"
            self.history[k].append(float(v))
            reports.append("{} = {:.4f}".format(k, float(v)))
        return ", ".join(reports)

    def log(self) -> str:
        metrics = {
            k: (sum(v) / len(v) if v else 0)
            for k, v in sorted(self.history.items())
            if k.startswith("val_") != self.is_train
        }
        return ", ".join(
            "average {} = {:.4f}".format(name, value)
            for name, value in metrics.items()
        ).capitalize()

    def save(self):
        if self.save_path is None:
            raise RuntimeError("cannot save history without setting save_path.")
        keys = [k for k, _ in sorted(self.history.items())]
        metrics = [sum(v) / len(v) for _, v in sorted(self.history.items())]
        if not os.path.exists(self.save_path):
            with open(self.save_path, "w") as fp:
                writer = csv.writer(fp)
                writer.writerow(keys + ["lr"])
                writer.writerow(metrics + [self.learning_rate])
        else:
            with open(self.save_path, "a") as fp:
                writer = csv.writer(fp)
                writer.writerow(metrics + [self.learning_rate])

    def report(self, last_n_epochs: int = 5) -> str:
        import pandas as pd

        df = pd.read_csv(self.save_path)
        metrics = "\n".join(
            f"{key:20s} {df[key][-last_n_epochs:].mean():.4f}"
            for key in df.keys()
            if key not in ["lr", "loss", "val_loss"]
        )
        return (
            underline("\nTraining Summary (Avg over last 5 epochs)", style="=")
            + "\n"
            + metrics
        )


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("csv_path", help="Path to history csv file")
    parser.add_argument("-l", "--last-n-epochs", type=int, default=5)
    args = parser.parse_args()
    print(HistoryTracker(args.csv_path).report(args.last_n_epochs))
