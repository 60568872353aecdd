"""Parallelism: device meshes, shardings, collectives-by-construction."""

from .mesh import (batch_sharding, data_parallel_devices, make_mesh,  # noqa: F401
                   param_sharding, replicated_sharding)
