"""Shared filesystem locations."""

import os


def user_cache_dir(*subdirs: str) -> str:
    """Per-user cache root (``$XDG_CACHE_HOME`` or ``~/.cache``) under a
    ``maskbit_tpu`` namespace, with optional sub-path components appended.
    Used for artifacts keyed to the machine, not the run: the persistent XLA
    compilation cache and the native decode library fallback build."""
    root = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    return os.path.join(root, "maskbit_tpu", *subdirs)
