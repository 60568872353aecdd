"""Data-parallel inference over the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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
