"""Data-parallel inference over the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8,
    reason="needs the 8-device virtual CPU mesh (single-chip TPU run)")

from wesup_tpu.config import WESUPConfig
from wesup_tpu.models import wesup
from wesup_tpu.models.steps import make_predict_step


def test_predict_step_shards_over_data_axis():
    devices = np.asarray(jax.devices()[:8]).reshape(8, 1)
    mesh = Mesh(devices, axis_names=("data", "model"))

    H, W, B = 64, 64, 8
    config = WESUPConfig(slic_iters=2, sp_area=100, compute_dtype="float32")
    params = wesup.init_params(jax.random.PRNGKey(0))
    step = make_predict_step(config, (H, W), mode="superpixel")

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (B, H, W, 3)).astype(np.uint8)
    valid = np.ones((B, H, W), bool)

    rep = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))
    params_d = jax.tree.map(lambda x: jax.device_put(x, rep), params)
    img_d = jax.device_put(img, bsh)
    valid_d = jax.device_put(valid, bsh)

    pred = step(params_d, img_d, valid_d)
    pred = jax.block_until_ready(pred)
    # output stays sharded over the batch axis
    assert len(pred.sharding.device_set) == 8

    # numerics identical to single-device execution
    single = step(params, jnp.asarray(img), jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(pred), np.asarray(single),
                               atol=1e-5)


def test_meshed_predictor_tiled_and_multiscale():
    """Predictor(mesh=...) shards whole-image, multi-scale AND tiled
    inference over the 'data' axis with numerics matching single-device
    (tile counts not divisible by shards exercise the blank-row padding)."""
    from wesup_tpu.inference import (Predictor, predict_multiscale,
                                     predict_tiled)

    devices = np.asarray(jax.devices()[:8]).reshape(8, 1)
    mesh = Mesh(devices, axis_names=("data", "model"))
    config = WESUPConfig(slic_iters=2, sp_area=100, compute_dtype="float32")
    params = wesup.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (70, 90, 3)).astype(np.uint8)

    solo = Predictor(params, config, mode="superpixel")
    shard = Predictor(params, config, mode="superpixel", mesh=mesh)
    assert shard.data_shards == 8

    # tiled: 70x90 with patch 48 -> 4 tiles (pads to 8 on the mesh)
    t_solo = predict_tiled(solo, img, patch_size=48)
    t_shard = predict_tiled(shard, img, patch_size=48)
    np.testing.assert_allclose(t_shard, t_solo, atol=1e-5)

    m_solo = predict_multiscale(solo, img, scales=(0.5,))
    m_shard = predict_multiscale(shard, img, scales=(0.5,))
    np.testing.assert_allclose(m_shard, m_solo, atol=1e-5)
