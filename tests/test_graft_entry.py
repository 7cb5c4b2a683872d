"""Guard the driver contract: entry() compiles and runs; dryrun_multichip
executes the full sharded Newton step on the virtual-device mesh."""

import sys

import jax
import numpy as np

sys.path.insert(0, ".")


def test_entry_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out["F"]["v"].shape == args[0]["v"].shape
    assert np.isfinite(np.asarray(out["F"]["v"])).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
