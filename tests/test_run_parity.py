"""tools/run_parity.sh gating: with no weight files present every step
skips with a clear message and the script exits 2 (nothing ran). The full
smoke path (synthetic flagship bins -> converter -> eval_maskbit) is
exercised separately via `run_parity.sh --smoke` (heavy; see
docs/parity_runbook.md)."""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_parity_skips_cleanly_without_weights(tmp_path):
    env = dict(os.environ)
    env.pop("MASKBIT_INCEPTION_WEIGHTS", None)
    env.pop("EVAL_SHARDS", None)
    env["WEIGHTS_DIR"] = str(tmp_path)  # empty: no zoo files
    env["OUT"] = str(tmp_path / "out")
    r = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "run_parity.sh")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 2, r.stdout + r.stderr
    for step in ("[1/3] SKIP", "[2/3] SKIP", "[3/3] SKIP"):
        assert step in r.stdout, r.stdout
