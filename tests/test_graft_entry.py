"""Driver entry points: single-chip compile check + 8-device CPU mesh dryrun."""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    jitted = jax.jit(fn)
    out = jitted(*args)
    out = np.asarray(out)
    assert out.shape == (1, 224, 320)
    assert np.isfinite(out).all()


def test_dryrun_multichip_8():
    if jax.default_backend() != "cpu":
        # dryrun_multichip must force the CPU platform BEFORE the backend
        # initializes; under WESUP_TEST_PLATFORM=axon it already has.
        import pytest

        pytest.skip("dryrun self-configures the CPU platform pre-init")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
