"""Multi-host (multi-process) data parallelism over the distributed backend.

SURVEY.md §5 "Distributed communication backend": single-host meshes use ICI
collectives implicitly; pod-scale runs go through
``wesup_tpu.runtime.initialize_multihost``.  This test actually exercises
that path: two OS processes, each owning 4 virtual CPU devices, form one
global 8-device data-parallel mesh and run the full jitted train step — the
gradient psum crosses the process boundary (Gloo on CPU, DCN on real pods).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path


_CHILD = Path(__file__).parent / "multihost_child.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_once(env):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(_CHILD), str(pid), "2", str(port), "4"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(_CHILD.parent.parent))
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            # both children cold-compile the train step simultaneously on
            # this box's single core after any compute-path change; warm
            # runs finish in ~1 min
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            outs.append("TIMEOUT (1200s)")
            continue
        outs.append(out)

    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            return False, f"proc {pid} failed (rc={p.returncode}):\n{out}"
        if f"proc {pid}/2: multihost train step OK" not in out:
            return False, f"proc {pid} missing OK line:\n{out}"
    return True, ""


def test_two_process_global_mesh_train_step(tmp_path):
    env = dict(os.environ)
    # children force their own platform/device count; scrub the parent's
    env.pop("XLA_FLAGS", None)
    env.pop("WESUP_TEST_PLATFORM", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

    # One retry: the two-process rendezvous is load-sensitive on this
    # single-core box (cross-process collective timeouts when the suite,
    # both children, and anything else share the one core).  A genuine
    # regression fails deterministically on both attempts; only
    # infra-timeout flakes are absorbed.
    ok, msg = _run_once(env)
    if not ok:
        sys.stderr.write(f"[multihost] first attempt failed, retrying:\n{msg}\n")
        ok, msg = _run_once(env)
    assert ok, msg
