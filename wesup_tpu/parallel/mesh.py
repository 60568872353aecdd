"""Device mesh + sharding helpers.

The reference is strictly single-device (models/base.py:53-54); scaling there
means "buy a bigger GPU".  Here scale-out is first-class: a
``jax.sharding.Mesh`` with axes ``('data', 'model')``:

- ``data``: batch images are sharded across chips; gradients are reduced by
  XLA-inserted all-reduces over ICI (the jit partitioner sees replicated
  params + sharded batch and does the right thing).
- ``model``: optional tensor parallelism for the MLP head — fc1/fc2 weights
  are sharded over their output/input dims so the big (HW, 1024) pixel-head
  matmuls split across chips.

All collectives are XLA's (psum/all-gather by construction), never hand-rolled
host communication.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_devices(requested: int = 0) -> int:
    """Number of devices to use (<=0 means all visible)."""
    n = len(jax.devices())
    if requested and requested > 0:
        return min(requested, n)
    return n


def make_mesh(num_devices: int = 0, model_parallel: int = 1) -> Mesh:
    n = data_parallel_devices(num_devices)
    model_parallel = max(1, math.gcd(model_parallel, n))
    data = n // model_parallel
    devices = np.asarray(jax.devices()[:data * model_parallel]).reshape(
        data, model_parallel)
    return Mesh(devices, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over 'data', everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params) -> dict:
    """Sharding pytree for WESUP params: fc1/fc2 tensor-parallel over
    'model' when that axis exists, everything else replicated."""
    use_tp = mesh.shape.get("model", 1) > 1

    def spec_for(path: str, leaf):
        if use_tp and leaf.ndim == 2:
            if path.startswith("fc1/") and path.endswith("w"):
                return P(None, "model")   # column-parallel
            if path.startswith("fc2/") and path.endswith("w"):
                return P("model", None)   # row-parallel (psum on output)
        return P()

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}{k}/") for k, v in tree.items()}
        return NamedSharding(mesh, spec_for(prefix[:-1], tree))

    return walk(params)
