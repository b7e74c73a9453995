"""bench.py hang-retry plumbing (VERDICT r3 #8): when a measure attempt
hangs (the relay-tunnel-down failure mode), the subprocess wrapper must kill
it at the timeout and retry — and the round artifact (ONE JSON line with the
driver-contract keys) must still be produced by a later attempt. The
scripted child stands in for the real measurement; what's under test is the
timeout/kill/retry loop, not the TPU numbers."""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


CHILD = """\
import json, os, sys, time
marker = sys.argv[1]
if not os.path.exists(marker):
    open(marker, "w").close()
    time.sleep(600)  # first attempt: simulate the hung relay device init
print(json.dumps({"metric": "images/sec/chip (test)", "value": 1.0,
                  "unit": "images/sec/chip", "vs_baseline": 1.0}))
"""


def test_bench_produces_json_after_first_attempt_hangs(tmp_path, monkeypatch, capfd):
    bench = _load_bench()
    marker = tmp_path / "first_attempt_ran"
    child = tmp_path / "child.py"
    child.write_text(CHILD)

    monkeypatch.setattr(
        bench, "_child_argv", lambda: [sys.executable, str(child), str(marker)])
    # generous: interpreter startup alone can take seconds on a loaded 1-vCPU
    # box, and the first attempt must get far enough to write the marker
    monkeypatch.setattr(bench, "ATTEMPT_TIMEOUT_S", 20)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)  # skip the backoff

    bench.main()

    assert marker.exists(), "the hanging first attempt never started"
    out, err = capfd.readouterr()
    json_lines = [ln for ln in out.splitlines() if ln.startswith("{")]
    assert len(json_lines) == 1, out
    record = json.loads(json_lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(record)
    assert "retrying" in err, err


def test_bench_exhausted_attempts_fail_loud(tmp_path, monkeypatch):
    bench = _load_bench()
    child = tmp_path / "child.py"
    child.write_text("import time; time.sleep(600)\n")

    monkeypatch.setattr(bench, "_child_argv", lambda: [sys.executable, str(child)])
    monkeypatch.setattr(bench, "ATTEMPT_TIMEOUT_S", 5)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    with pytest.raises(SystemExit, match="hang"):
        bench.main()
