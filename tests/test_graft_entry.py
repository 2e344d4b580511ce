"""Driver entry points must compile and run on the CPU mesh."""
import sys
import os

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    bits, success, iters = out
    assert bits.shape == (256, 280)


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
