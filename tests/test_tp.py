"""Tensor-parallel (fc1 column / fc2 row sharding) numeric equivalence.

SURVEY.md §2.5 scale-out: the 'model' mesh axis must change WHERE the MLP
matmuls run, never WHAT they compute.  These tests prove model_parallel=2
reproduces model_parallel=1 numerics the way tests/test_trainer_dp.py proves
it for the 'data' axis.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from make_dataset import make_dataset  # noqa: E402


def _trainer(num_devices, model_parallel, **kw):
    from wesup_tpu.models import initialize_trainer

    return initialize_trainer(
        "wesup", epochs=2, batch_size=2, slic_iters=2, sp_area=64,
        compute_dtype="float32", num_devices=num_devices,
        model_parallel=model_parallel, **kw)


def test_tp_training_matches_single_device(tmp_path, monkeypatch,
                                           tmp_path_factory):
    """A 4x2 (data, model) mesh — DP and TP at once — must reproduce the
    single-device training history (same data, same rng)."""
    import jax
    import pandas as pd

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    root = tmp_path_factory.mktemp("tp_ds")
    make_dataset(root, n_train=6, n_val=2, hw=(48, 64))

    hists = {}
    for name, (nd, mp) in {"single": (1, 1), "tp": (8, 2)}.items():
        monkeypatch.setenv("RECORD_ROOT", str(tmp_path / name))
        trainer = _trainer(nd, mp)
        if name == "tp":
            assert trainer.mesh.shape == {"data": 4, "model": 2}
            # fc1 weight really is column-sharded over the 'model' axis
            spec = trainer.params["fc1"]["w"].sharding.spec
            assert tuple(spec) == (None, "model"), spec
            spec2 = trainer.params["fc2"]["w"].sharding.spec
            assert tuple(spec2) == ("model", None), spec2
        trainer.train(root, epochs=2)
        hists[name] = pd.read_csv(trainer.record_dir / "history.csv")

    assert list(hists["single"].columns) == list(hists["tp"].columns)
    np.testing.assert_allclose(hists["single"].to_numpy(np.float64),
                               hists["tp"].to_numpy(np.float64),
                               rtol=1e-4, atol=1e-6)


def test_tp_predict_equals_replicated(tmp_path_factory):
    """predict_probs under model_parallel=2 equals the replicated output
    bit-for-bit up to the psum reassociation tolerance."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")

    t1 = _trainer(1, 1)
    t2 = _trainer(8, 2)
    t2.load_state_dict(t1.state_dict())  # identical weights, resharded

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (45, 61, 3)).astype(np.uint8)
    p1 = t1.predict_probs(img)
    p2 = t2.predict_probs(img)
    assert p1.shape == p2.shape == (45, 61)
    np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-6)


def test_tp_pixel_forward_equals_replicated():
    """forward_pixel under model_parallel=2 — the path where TP actually
    pays (reference WESUPPixelInference runs fc2 on EVERY pixel,
    models/wesup.py:382-400) — equals the replicated output to psum
    reassociation tolerance, with fc1/fc2 genuinely sharded over 'model'."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from wesup_tpu.config import WESUPConfig
    from wesup_tpu.inference import Predictor
    from wesup_tpu.models import wesup
    from wesup_tpu.parallel import make_mesh

    config = WESUPConfig(compute_dtype="float32")
    params = wesup.init_params(jax.random.PRNGKey(3))
    mesh = make_mesh(8, 2)
    assert mesh.shape == {"data": 4, "model": 2}

    solo = Predictor(params, config, mode="pixel")
    tp = Predictor(params, config, mode="pixel", mesh=mesh)
    # inference placement must PRESERVE tensor parallelism, not re-replicate
    assert tuple(tp.params["fc1"]["w"].sharding.spec) == (None, "model")
    assert tuple(tp.params["fc2"]["w"].sharding.spec) == ("model", None)

    rng = np.random.default_rng(0)
    imgs = rng.random((2, 96, 128, 3)).astype(np.float32)
    p1 = solo.predict_padded(imgs)
    p2 = tp.predict_padded(imgs)
    assert p1.shape == p2.shape == (2, 96, 128)
    np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-6)
