"""Driver hooks stay green: entry() compile + multi-chip dryrun on CPU mesh."""

import importlib.util
import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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


def test_dryrun_multichip_bootstraps_without_conftest():
    """The driver's exact failure mode: dryrun called with only 1 visible
    device (no conftest to pre-set an 8-device platform). The function must
    re-exec itself into an 8-device virtual CPU mesh and succeed."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["MASKBIT_ENTRY_SMALL"] = "1"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip(8)" in proc.stdout, proc.stdout
