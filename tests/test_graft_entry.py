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
    import __graft_entry__ as g

    g.dryrun_multichip(8)
