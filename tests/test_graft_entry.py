"""Guard the driver contract: entry() compiles, dryrun_multichip runs on
the virtual 8-device mesh."""

import sys

import jax
import numpy as np


def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    fn, args = g.entry()
    masks, iou, obj = jax.jit(fn)(*args)
    assert masks.shape[0] == 1
    assert np.isfinite(np.asarray(iou)).all()


def test_dryrun_multichip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    g.dryrun_multichip(8)
