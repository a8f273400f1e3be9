"""Driver entry points never rot: entry() compiles and runs; the
multi-chip dryrun executes on the virtual mesh."""

import numpy as np


def test_entry_jittable():
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert int(np.asarray(out.mapped).sum()) > 0


def test_dryrun_multichip():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
