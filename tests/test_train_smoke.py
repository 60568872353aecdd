"""End-to-end training smoke test on a tiny synthetic dataset (CPU mesh)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from make_dataset import make_dataset  # noqa: E402


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return make_dataset(root, n_train=3, n_val=2, hw=(64, 80))


def test_fit_smoke(dataset, tmp_path, monkeypatch):
    monkeypatch.setenv("RECORD_ROOT", str(tmp_path / "records"))
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from train import fit

    trainer = None

    # run 2 epochs on the point dataset; canvas small; keep record dir
    import train as train_mod  # noqa: F401
    from wesup_tpu.models import initialize_trainer

    trainer = initialize_trainer(
        "wesup", epochs=2, canvas_size=(48, 64), slic_iters=3,
        compute_dtype="float32", sp_area=100)
    trainer.train(dataset, epochs=2)

    record_dir = trainer.record_dir
    assert (record_dir / "history.csv").exists()
    assert (record_dir / "train.log").exists()
    assert (record_dir / "params" / "0.json").exists()
    assert (record_dir / "source" / "wesup_tpu").exists()
    ckpts = list((record_dir / "checkpoints").glob("ckpt.*"))
    assert len(ckpts) == 1  # latest-only retention
    assert ckpts[0].name == "ckpt.0002.msgpack"

    import pandas as pd

    hist = pd.read_csv(record_dir / "history.csv")
    assert len(hist) == 2
    for col in ["loss", "accuracy", "dice", "val_accuracy", "val_dice",
                "labeled_sp_ratio", "lr"]:
        assert col in hist.columns, hist.columns
    assert np.isfinite(hist["loss"]).all()

    # resume from checkpoint: epoch numbering continues
    trainer2 = initialize_trainer(
        "wesup", epochs=1, canvas_size=(48, 64), slic_iters=3,
        compute_dtype="float32", sp_area=100)
    trainer2.train(dataset, epochs=1, checkpoint=str(ckpts[0]))
    ckpts2 = list((record_dir / "checkpoints").glob("ckpt.*"))
    assert ckpts2 and ckpts2[0].name == "ckpt.0003.msgpack"


def test_pluggable_eval_metrics(dataset, tmp_path, monkeypatch):
    """CLI-style metrics= selection (reference train.py:26-27 API): extra
    host-side metrics are evaluated on val predictions via evaluate_host
    and land in history.csv as val_<name>."""
    monkeypatch.setenv("RECORD_ROOT", str(tmp_path / "m_records"))
    from wesup_tpu.models import initialize_trainer

    trainer = initialize_trainer(
        "wesup", epochs=1, canvas_size=(48, 64), slic_iters=2,
        compute_dtype="float32", sp_area=100,
        metrics=("accuracy", "dice", "object_dice", "detection_f1"))
    trainer.train(dataset, epochs=1)

    import pandas as pd

    hist = pd.read_csv(trainer.record_dir / "history.csv")
    for col in ("val_object_dice", "val_detection_f1", "val_accuracy"):
        assert col in hist.columns, hist.columns
    assert np.isfinite(hist["val_object_dice"]).all()
    # unknown names fail loudly
    bad = initialize_trainer(
        "wesup", epochs=1, canvas_size=(48, 64), slic_iters=2,
        compute_dtype="float32", sp_area=100, metrics="not_a_metric")
    with pytest.raises(ValueError, match="unknown metric"):
        bad.train(dataset, epochs=1)


def test_default_path_fetches_no_predictions(dataset, tmp_path, monkeypatch):
    """Regression guard: WITHOUT extra metrics= the val phase must never
    fetch prediction maps device->host (each fetch is ~30 ms/RPC through the
    axon tunnel and would serialize the phase); WITH extra metrics the
    fetches happen once per batch, AFTER the step loop (deferred — see
    WESUPTrainer._fetch_pred / _run_val_phase)."""
    monkeypatch.setenv("RECORD_ROOT", str(tmp_path / "g_records"))
    from wesup_tpu.models import initialize_trainer
    from wesup_tpu.models.trainer import WESUPTrainer

    calls = []
    orig = WESUPTrainer._fetch_pred
    monkeypatch.setattr(WESUPTrainer, "_fetch_pred",
                        lambda self, pred: calls.append(1) or orig(self, pred))

    trainer = initialize_trainer(
        "wesup", epochs=1, canvas_size=(48, 64), slic_iters=2,
        compute_dtype="float32", sp_area=100)
    trainer.train(dataset, epochs=1)
    assert calls == [], "default path fetched prediction maps"

    trainer2 = initialize_trainer(
        "wesup", epochs=1, canvas_size=(48, 64), slic_iters=2,
        compute_dtype="float32", sp_area=100, metrics=("object_dice",))
    trainer2.train(dataset, epochs=1)
    n_val_batches = len(trainer2.dataloaders["val"])
    assert len(calls) == n_val_batches, (len(calls), n_val_batches)


def test_checkpoint_period(dataset, tmp_path, monkeypatch):
    """checkpoint_period gates per-epoch checkpoint writes: 0 writes none
    (ablation/benchmark runs on this slow-disk host), N > 1 still writes the
    final epoch; the default (1) is the reference's per-epoch cadence,
    asserted by test_fit_smoke above."""
    monkeypatch.setenv("RECORD_ROOT", str(tmp_path / "cp_records"))
    from wesup_tpu.models import initialize_trainer

    kw = dict(canvas_size=(48, 64), slic_iters=2, compute_dtype="float32",
              sp_area=100)
    t0 = initialize_trainer("wesup", epochs=1, checkpoint_period=0, **kw)
    t0.train(dataset, epochs=1)
    assert not (t0.record_dir / "checkpoints").exists() or \
        not list((t0.record_dir / "checkpoints").glob("ckpt.*"))

    t3 = initialize_trainer("wesup", epochs=3, checkpoint_period=2, **kw)
    t3.train(dataset, epochs=3)
    ckpts = sorted(p.name for p in
                   (t3.record_dir / "checkpoints").glob("ckpt.*"))
    # epoch 2 (period) may be superseded by the latest-only retention;
    # the final epoch 3 must exist
    assert ckpts == ["ckpt.0003.msgpack"], ckpts


def test_fit_smoke_flag_deletes_record_dir(dataset, tmp_path, monkeypatch):
    """train.py's smoke=True removes the record dir afterwards
    (reference train.py:23-28)."""
    monkeypatch.setenv("RECORD_ROOT", str(tmp_path / "smoke_records"))
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from train import fit

    fit(str(dataset), epochs=1, smoke=True, canvas_size=(48, 64),
        slic_iters=2, compute_dtype="float32", sp_area=100)
    leftover = list((tmp_path / "smoke_records").glob("*"))
    assert leftover == [], leftover
