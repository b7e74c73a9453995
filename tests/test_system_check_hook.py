"""Opt-in hook to run the full TPU system check under pytest:
    MASKBIT_SYSTEM_CHECK=1 python -m pytest tests/test_system_check_hook.py
(Requires the attached TPU; ~2 min. Skipped by default — the CPU suite
covers the same code paths at toy scale.)"""

import os
import sys

import pytest


@pytest.mark.skipif(
    os.environ.get("MASKBIT_SYSTEM_CHECK") != "1",
    reason="set MASKBIT_SYSTEM_CHECK=1 (and run on TPU) to enable",
)
def test_full_system_check():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))
    import system_check

    system_check.main()
