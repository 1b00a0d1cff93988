"""Driver entry points (__graft_entry__): compile-check entry() and run the
multi-device dry run on the suite's 8-device CPU mesh — the same paths the
round driver validates."""

import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_solves():
    fn, args = graft.entry()
    x, k, rnorm = jax.jit(fn)(*args)
    assert np.asarray(x).shape == args[1].shape
    assert int(k) >= 1
    assert float(rnorm) < 1e-5


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
