"""Experiment record directories (reference: utils/record.py).

Layout parity with the reference (documented user-facing in its README):
``$RECORD_ROOT or ~/records / <timestamp>/ {checkpoints/, params/<n>.json,
source/, curves/, history.csv, train.log}``.
"""

from __future__ import annotations

import glob
import json
import os
from datetime import datetime
from pathlib import Path
from shutil import copyfile, copytree, rmtree


def prepare_record_dir() -> Path:
    """Create a new timestamped record directory (utils/record.py:19-38)."""
    record_root = Path.home() / "records"
    if os.environ.get("RECORD_ROOT"):
        record_root = Path(os.environ["RECORD_ROOT"]).expanduser()
    record_root.mkdir(parents=True, exist_ok=True)

    record_dir = record_root / datetime.now().strftime("%Y%m%d-%I%M-%p")
    record_dir.mkdir(exist_ok=True)
    (record_dir / "checkpoints").mkdir(exist_ok=True)
    return record_dir


def save_params(record_dir: Path, params: dict):
    """Snapshot run parameters to params/<n>.json (utils/record.py:41-52)."""
    params_dir = Path(record_dir) / "params"
    params_dir.mkdir(exist_ok=True)
    num_of_runs = len(list(params_dir.iterdir()))
    with open(params_dir / f"{num_of_runs}.json", "w") as fp:
        json.dump(params, fp, indent=4, default=str)


def copy_source_files(record_dir: Path):
    """Snapshot the framework source for reproduction (utils/record.py:55-68)."""
    source_dir = Path(record_dir) / "source"
    if source_dir.exists():
        rmtree(source_dir)
    source_dir.mkdir()

    pkg_root = Path(__file__).resolve().parent.parent  # wesup_tpu/
    repo_root = pkg_root.parent
    copytree(pkg_root, source_dir / "wesup_tpu",
             ignore=lambda d, names: [n for n in names if n == "__pycache__"])
    for source_file in glob.glob(str(repo_root / "*.py")):
        copyfile(source_file, source_dir / os.path.basename(source_file))


def plot_learning_curves(history_path: Path):
    """Per-metric learning-curve PNGs from history.csv (utils/record.py:71-107)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    history_path = Path(history_path)
    history = pd.read_csv(history_path)
    curves_dir = history_path.parent / "curves"
    curves_dir.mkdir(exist_ok=True)

    for key in history.columns:
        if key.startswith("val_"):
            if key.replace("val_", "") not in history.columns:
                plt.figure(dpi=200)
                plt.title("Model " + key.replace("val_", ""))
                plt.plot(history[key])
                plt.ylabel(key.replace("val_", "").capitalize())
                plt.xlabel("Epoch")
                plt.grid(True)
                plt.savefig(curves_dir / f"{key}.png")
                plt.close()
            continue
        if key == "lr":
            continue
        plt.figure(dpi=200)
        try:
            plt.plot(history[key])
            if "val_" + key in history.columns:
                plt.plot(history["val_" + key])
        except KeyError:
            pass
        plt.title("Model " + key)
        plt.ylabel(key.capitalize())
        plt.xlabel("Epoch")
        plt.legend(["Train", "Val"])
        plt.grid(True)
        plt.savefig(curves_dir / f"{key}.png")
        plt.close()
