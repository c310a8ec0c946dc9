"""Driver contract: __graft_entry__.entry() jits single-device and
dryrun_multichip(8) executes a sharded train step on the CPU mesh."""
import sys

import numpy as np

import jax

import pytest

pytestmark = pytest.mark.slow


def _load_graft():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    return __graft_entry__


def test_entry_compiles_and_runs():
    g = _load_graft()
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert {"depth", "confidence"} <= set(out)
    depth = np.asarray(out["depth"])
    assert depth.ndim == 3 and np.isfinite(depth).all()


def test_dryrun_multichip_8():
    g = _load_graft()
    g.dryrun_multichip(8)  # asserts internally on loss finiteness
