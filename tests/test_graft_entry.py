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
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, "tests", ".jax_cache"))
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


def test_dryrun_multichip_ignores_env_that_claims_enough_devices():
    """Round-3 regression (MULTICHIP_r03 red): the parent's env claimed a
    platform/device-count the bound backend didn't have (the axon site hook
    binds the TPU even with JAX_PLATFORMS=cpu exported). A probe subprocess
    inheriting that env reported 8 devices, the parent skipped the respawn,
    and create_mesh died on its real 1-device backend. dryrun_multichip must
    never trust the env: here the parent initializes a 1-device backend,
    THEN the env is made to claim 8 — the run must still succeed by
    respawning into a fresh forced-CPU child."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # backend init below sees 1 CPU device
    env["MASKBIT_ENTRY_SMALL"] = "1"
    env.pop("MASKBIT_DRYRUN_CHILD", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, "tests", ".jax_cache"))
    code = (
        "import os, jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1, jax.devices(); "
        # after backend init, make the ENV claim 8 devices — the real
        # backend still has 1; any env-trusting probe would report 8
        "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'; "
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
