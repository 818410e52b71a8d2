"""Multi-chip dry run over the 8-device virtual CPU mesh."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    rgb, depth, op = out
    assert rgb.shape == (1024, 3)
    assert depth.shape == (1024,)
    assert op.shape == (1024,)
