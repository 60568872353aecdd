"""Optimizer parity: our optax chain vs torch.optim.SGD(momentum, wd)."""

import jax.numpy as jnp
import numpy as np
import torch

from wesup_tpu.config import WESUPConfig
from wesup_tpu.models.steps import make_optimizer


def test_sgd_matches_torch():
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)

    config = WESUPConfig(lr=0.1, momentum=0.9, weight_decay=0.01)
    tx = make_optimizer(config)
    params = {"cls": {"w": jnp.asarray(w0)}}
    state = tx.init(params)

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([wt], lr=0.1, momentum=0.9, weight_decay=0.01)

    for step in range(5):
        g = rng.standard_normal(w0.shape).astype(np.float32)
        grads = {"cls": {"w": jnp.asarray(g)}}
        updates, state = tx.update(grads, state, params)
        import optax

        params = optax.apply_updates(params, updates)

        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

        np.testing.assert_allclose(np.asarray(params["cls"]["w"]),
                                   wt.detach().numpy(), atol=1e-6,
                                   err_msg=f"diverged at step {step}")


def test_freeze_backbone_zeroes_backbone_updates():
    import optax

    config = WESUPConfig(lr=0.1, momentum=0.9, weight_decay=0.01,
                         freeze_backbone=True)
    tx = make_optimizer(config)
    params = {"backbone": {"conv0": {"w": jnp.ones((2, 2))}},
              "cls": {"w": jnp.ones((2, 2))}}
    state = tx.init(params)
    grads = {"backbone": {"conv0": {"w": jnp.ones((2, 2))}},
             "cls": {"w": jnp.ones((2, 2))}}
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(new["backbone"]["conv0"]["w"]),
                                  np.ones((2, 2)))
    assert not np.allclose(np.asarray(new["cls"]["w"]), np.ones((2, 2)))
