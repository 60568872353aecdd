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


def test_two_process_global_mesh_train_step(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # children force their own platform/device count; scrub the parent's
    env.pop("XLA_FLAGS", None)
    env.pop("WESUP_TEST_PLATFORM", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

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
            raise
        outs.append(out)

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}/2: multihost train step OK" in out, out
