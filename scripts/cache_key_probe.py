"""Print the XLA compilation-cache key components for the bench's B=1 program.

Diagnostic for VERDICT r4 #1: bench cache entries written in-session were
observed to MISS in the driver's bench run an hour later (same tree).  This
prints each cache-key component hash (jax._src.cache_key DEBUG logs) so two
runs/environments can be diffed to find the volatile component.
"""
import logging, os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

handler = logging.StreamHandler(sys.stdout)
handler.setFormatter(logging.Formatter("%(name)s %(message)s"))
for name in ("jax._src.cache_key", "jax._src.compilation_cache", "jax._src.compiler"):
    lg = logging.getLogger(name)
    lg.setLevel(logging.DEBUG)
    lg.addHandler(handler)

import jax, jax.numpy as jnp
import numpy as np
from functools import partial
import bench

from wesup_tpu.config import WESUPConfig
from wesup_tpu.models import wesup
from wesup_tpu.models.steps import make_predict_step

config = WESUPConfig()
params = wesup.init_params(jax.random.PRNGKey(0))
step = make_predict_step(config, bench.CANVAS, mode="superpixel")

@partial(jax.jit, static_argnames="n")
def repeat_steps(params, imgs, valid, n):
    def body(carry, salt):
        out = step(params, imgs + salt, valid)
        return carry + jnp.mean(out), None
    total, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n, dtype=jnp.uint8))
    return total

imgs, valid = bench.make_images(1)
imgs, valid = jnp.asarray(imgs), jnp.asarray(valid)
print("ENV XLA_FLAGS=", repr(os.environ.get("XLA_FLAGS")))
print("ENV LIBTPU_INIT_ARGS=", repr(os.environ.get("LIBTPU_INIT_ARGS")))
print("devices:", jax.devices())
import time
t0 = time.time()
val = float(np.asarray(repeat_steps(params, imgs, valid, 2)))
print(f"first call: {time.time()-t0:.1f}s val={val}")
