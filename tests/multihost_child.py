"""Child process for the multi-host (DCN) test: one train step over a
2-process x 4-device global data-parallel mesh.

Run as: python multihost_child.py <pid> <nproc> <port> <nlocal>

Each process forces the CPU platform with ``nlocal`` virtual devices, joins
the cluster via ``wesup_tpu.runtime.initialize_multihost`` (the documented
pod-scale entry point), contributes its LOCAL shard of the global batch, and
executes the full jitted train step — gradient reduction over the 'data'
axis crosses the process boundary through the distributed backend (Gloo on
CPU; DCN on real pods).
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
nlocal = int(sys.argv[4])

os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={nlocal}"
sys.path.insert(0, str(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax  # noqa: E402

from wesup_tpu.runtime import force_platform, initialize_multihost  # noqa: E402

force_platform("cpu")  # also host-scopes the CPU compilation cache dir

initialize_multihost(f"127.0.0.1:{port}", nproc, pid)

import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

import __graft_entry__ as graft  # noqa: E402
from wesup_tpu.config import WESUPConfig  # noqa: E402
from wesup_tpu.models import steps, wesup  # noqa: E402

n_global = nproc * nlocal
devices = jax.devices()
assert len(devices) == n_global, devices
assert jax.process_count() == nproc
mesh = Mesh(np.asarray(devices).reshape(n_global, 1), ("data", "model"))


def to_global(tree, spec):
    return multihost_utils.host_local_array_to_global_array(
        jax.tree.map(np.asarray, tree), mesh, spec)


H, W = 64, 64
config = WESUPConfig(slic_iters=2, sp_area=100, compute_dtype="float32",
                     batch_size=n_global)
params = wesup.init_params(jax.random.PRNGKey(0))  # identical per process
tx = steps.make_optimizer(config)
opt_state = tx.init(params)

# each process contributes a DIFFERENT local batch shard
local_batch = graft._tiny_batch(nlocal, H, W)
local_batch["image"] += np.uint8(pid)  # make shards distinguishable

params = to_global(params, P())
opt_state = to_global(opt_state, P())
acc = to_global(steps.init_metric_acc(), P())
batch = to_global(local_batch, P("data"))
rng = to_global(jax.random.key_data(jax.random.PRNGKey(1)), P())

step = steps.make_train_step(config, (H, W), point_mode=True, tx=tx)

# Compile BEFORE touching any collective, then rendezvous at the
# coordination-service barrier (which does not go through Gloo): Gloo's
# context init times out after ~30 s, and two cold compiles on one core can
# easily skew the processes' first collective by more than that.
rng_key = jax.random.wrap_key_data(rng)
compiled = step.lower(params, opt_state, acc, batch, rng_key).compile()
try:
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(
        "wesup_mh_compiled", timeout_in_ms=20 * 60 * 1000)
except (ImportError, AttributeError):
    pass  # older jax: fall back to Gloo-rendezvous luck

params, opt_state, acc = compiled(params, opt_state, acc, batch, rng_key)
# read the loss from the LOCAL addressable shard of the replicated
# accumulator — launching a second program here would create a second
# Gloo communicator whose 30 s rendezvous can time out if the peer is
# still executing its (contended, single-core) train step
loss_sum = np.asarray(acc["sums"]["loss"].addressable_data(0))
count = np.asarray(acc["count"].addressable_data(0))
loss = float(loss_sum) / max(float(count), 1.0)
assert np.isfinite(loss), loss
print(f"proc {pid}/{nproc}: multihost train step OK loss={loss:.4f}")
