"""Driver contract: __graft_entry__.entry compiles and runs; dryrun_multichip
executes a full DP+TP+FSDP train step on the fake 8-device CPU mesh."""

import sys
import pathlib

import jax
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (64,)
    assert np.isfinite(out).all()


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    # odd device counts degrade to pure DP
    graft.dryrun_multichip(1)
