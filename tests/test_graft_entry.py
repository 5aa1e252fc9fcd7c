"""Driver-contract regression: entry() compiles and dryrun_multichip runs
on the virtual CPU mesh."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    loss, psnr = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(psnr))


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as g

    g.dryrun_multichip(2)
