"""Protect the driver contract: entry() compile-checks single-chip;
dryrun_multichip(n) must compile + run the full sharded step."""

import importlib.util
import os

import numpy as np
import pytest
import jax


def _load():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..",
                                    "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_jits_and_runs():
    mod = _load()
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    nlml, mean, var = out
    assert np.isfinite(np.asarray(nlml)).all()
    assert np.asarray(mean).shape == np.asarray(var).shape


@pytest.mark.slow
def test_dryrun_multichip_8():
    mod = _load()
    mod.dryrun_multichip(8)
