"""Trainer-level data parallelism on the virtual 8-device mesh."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from make_dataset import make_dataset  # noqa: E402


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("dp_ds")
    return make_dataset(root, n_train=8, n_val=2, hw=(48, 64))


def test_trainer_dp_over_8_devices(dataset, tmp_path, monkeypatch):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    monkeypatch.setenv("RECORD_ROOT", str(tmp_path / "records"))

    from wesup_tpu.models import initialize_trainer

    trainer = initialize_trainer(
        "wesup", epochs=2, batch_size=8, canvas_size=(32, 32), slic_iters=2,
        sp_area=64, compute_dtype="float32", num_devices=8)
    assert trainer.mesh.shape["data"] == 8
    trainer.train(dataset, epochs=2)

    import pandas as pd

    hist = pd.read_csv(trainer.record_dir / "history.csv")
    assert len(hist) == 2
    assert np.isfinite(hist["loss"]).all()
    # params remain fully replicated across the mesh
    leaf = jax.tree.leaves(trainer.params)[0]
    assert len(leaf.sharding.device_set) in (1, 8)
