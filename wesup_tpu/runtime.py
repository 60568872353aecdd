"""Runtime/platform configuration helpers.

This environment's axon TPU plugin installs a sitecustomize that rewrites
``jax_platforms`` and swallows JAX's cache env vars, so configuration must go
through ``jax.config.update`` AFTER importing jax.  Centralized here; every
entry point calls :func:`configure` early.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None):
    """Persistent XLA compilation cache (big win: this host has 1 CPU core,
    cold compiles of the fused train step take minutes)."""
    import jax

    cache_dir = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or "/tmp/jax_comp_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags


def force_platform(platform: str):
    """Override the sitecustomize-pinned platform list ('cpu' or 'axon')."""
    import jax

    jax.config.update("jax_platforms", platform)


def configure(platform: str | None = None):
    enable_compilation_cache()
    if platform:
        force_platform(platform)


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None):
    """Multi-host initialization (DCN) for pod-scale runs.

    Single-host v5e-8 needs nothing (ICI collectives are implicit in the
    mesh); for multi-host slices call this once per process before building
    meshes.  Exercised by tests/test_multihost.py: two processes form one
    global 8-device mesh and run the full train step with the gradient
    reduction crossing the process boundary (Gloo on CPU, DCN on pods).
    """
    import jax

    kwargs = {}
    if coordinator_address:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
