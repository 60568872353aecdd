"""HistoryTracker csv layout + record-dir helpers (reference format parity)."""

import csv

import numpy as np

from wesup_tpu.utils import record, underline
from wesup_tpu.utils.history import HistoryTracker


def test_underline():
    assert underline("abc", "=") == "abc\n==="


def test_tracker_prefixes_and_logs():
    t = HistoryTracker()
    t.start_new_epoch(5e-5)
    t.train()
    t.step({"loss": 1.0, "dice": 0.5})
    t.step({"loss": 0.5, "dice": 0.7})
    t.eval()
    t.step({"dice": 0.8})
    assert t.history["loss"] == [1.0, 0.5]
    assert t.history["val_dice"] == [0.8]
    assert "average val_dice = 0.8000" in t.log().lower()
    t.train()
    assert "average dice = 0.6000" in t.log().lower()


def test_tracker_csv_layout(tmp_path):
    """Sorted keys + trailing lr column; append on subsequent epochs
    (reference utils/history.py:46-64)."""
    path = tmp_path / "history.csv"
    t = HistoryTracker(save_path=path)
    t.start_new_epoch(1e-4)
    t.step({"loss": 1.0, "accuracy": 0.5})
    t.eval()
    t.step({"accuracy": 0.6})
    t.save()
    t.start_new_epoch(1e-4)
    t.train()
    t.step({"loss": 0.8, "accuracy": 0.55})
    t.eval()
    t.step({"accuracy": 0.65})
    t.save()

    rows = list(csv.reader(open(path)))
    assert rows[0] == ["accuracy", "loss", "val_accuracy", "lr"]
    assert len(rows) == 3
    assert float(rows[1][1]) == 1.0
    assert float(rows[2][3]) == 1e-4


def test_record_dir_layout(tmp_path, monkeypatch):
    monkeypatch.setenv("RECORD_ROOT", str(tmp_path))
    rd = record.prepare_record_dir()
    assert rd.parent == tmp_path
    assert (rd / "checkpoints").is_dir()

    record.save_params(rd, {"lr": 5e-5, "epochs": 3})
    record.save_params(rd, {"lr": 1e-4})
    import json

    assert json.load(open(rd / "params" / "0.json"))["epochs"] == 3
    assert json.load(open(rd / "params" / "1.json"))["lr"] == 1e-4

    record.copy_source_files(rd)
    assert (rd / "source" / "wesup_tpu" / "ops" / "slic.py").exists()
    assert not list((rd / "source").rglob("__pycache__"))


def test_plot_learning_curves(tmp_path):
    """Emitted PNG set matches the reference's plot loop exactly for a
    representative history: every non-val_ column gets <col>.png ('lr'
    included — reference utils/record.py:80-107 draws the lr line before its
    val_lr KeyError is swallowed), and a val-only column gets val_<col>.png."""
    path = tmp_path / "history.csv"
    cols = ["accuracy", "loss", "val_accuracy", "val_object_dice", "lr"]
    with open(path, "w") as fp:
        w = csv.writer(fp)
        w.writerow(cols)
        for i in range(3):
            w.writerow([0.5 + 0.1 * i, 1.0 - 0.2 * i, 0.4 + 0.1 * i,
                        0.3 + 0.1 * i, 5e-5])
    record.plot_learning_curves(path)
    names = {c.name for c in (tmp_path / "curves").glob("*.png")}
    # the reference loop over these columns saves exactly these files
    assert names == {"accuracy.png", "loss.png", "val_object_dice.png",
                     "lr.png"}
