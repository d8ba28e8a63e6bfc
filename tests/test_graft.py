"""Guard the driver entry points: entry() compiles and dryrun_multichip
shards over the 8-device CPU mesh."""

import numpy as np


def test_entry_compiles():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
