"""Test configuration: run on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4: multi-device behavior is validated with
``--xla_force_host_platform_device_count=8`` so no TPU is needed for CI.

NOTE: this environment exports JAX_PLATFORMS=axon (the real TPU tunnel); we
must FORCE cpu here — parity tests need strict f32 conv/matmul semantics, and
the virtual 8-device mesh only exists on the host platform.  Set
WESUP_TEST_PLATFORM=axon to deliberately run the suite on the TPU.
"""

import os

_platform = os.environ.get("WESUP_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# this box has a single CPU core: persistent compilation cache is a big win
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The axon sitecustomize force-overrides JAX_PLATFORMS to "axon,cpu" and
# swallows the cache env vars; undo through the config API (must happen
# before any backend is initialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
# CPU cache entries are host-scoped (stale cross-host CPU AOT executables
# fatally abort on deserialize — see wesup_tpu.runtime.cache_dir_for)
from wesup_tpu.runtime import cache_dir_for  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cache_dir_for(_platform))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

if _platform != "cpu":
    # The parity suite asserts f32-strict tolerances (1e-4..1e-6) against
    # torch/cv2/numpy references.  TPU matmuls default to bf16 passes for
    # f32 inputs; request full f32 accumulation so the SAME assertions run
    # on real hardware (production configs use compute_dtype=bfloat16
    # explicitly, so this only affects f32 test tolerances, not the
    # benchmarked path).
    jax.config.update("jax_default_matmul_precision", "highest")
