"""Driver hooks stay green: entry() compile + multi-chip dryrun on CPU mesh."""

import importlib.util
import os

import jax
import pytest


def _load_graft():
    os.environ["MASKBIT_ENTRY_SMALL"] = "1"
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def test_entry_compiles():
    graft = _load_graft()
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 256, 2, 128)


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    graft = _load_graft()
    graft.dryrun_multichip(8)
