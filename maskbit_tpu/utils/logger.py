"""Colored console + file logger.

Parity target: reference utils/logger.py:43-96 — colored console handler,
optional file handler, per-process gating (only rank 0 logs by default).
Remote `scheme://` log paths stream through fsspec with a 1 MB buffer
(reference utils/logger.py:83-96 does the same via iopath) so pods logging
to object storage don't issue one PUT per line.
"""

from __future__ import annotations

import atexit
import functools
import logging
import os
import sys
from typing import Optional

_COLORS = {
    logging.DEBUG: "\x1b[36m",      # cyan
    logging.INFO: "\x1b[32m",       # green
    logging.WARNING: "\x1b[33m",    # yellow
    logging.ERROR: "\x1b[31m",      # red
    logging.CRITICAL: "\x1b[41m",   # red background
}
_RESET = "\x1b[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        color = _COLORS.get(record.levelno, "")
        return f"{color}{msg}{_RESET}" if color and sys.stderr.isatty() else msg


@functools.lru_cache()
def setup_logger(
    name: str = "maskbit_tpu",
    log_level: int = logging.INFO,
    output_file: Optional[str] = None,
    main_process_only: bool = True,
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(log_level)
    logger.propagate = False

    is_main = True
    try:
        import jax

        is_main = jax.process_index() == 0
    except Exception:
        pass

    if main_process_only and not is_main:
        logger.addHandler(logging.NullHandler())
        return logger

    fmt = "[%(asctime)s %(name)s %(levelname)s]: %(message)s"
    console = logging.StreamHandler(sys.stderr)
    console.setFormatter(_ColorFormatter(fmt, datefmt="%m/%d %H:%M:%S"))
    logger.addHandler(console)

    if output_file:
        if "://" in output_file:
            fh = logging.StreamHandler(_cached_log_stream(output_file))
        else:
            os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
            fh = logging.FileHandler(output_file)
        fh.setFormatter(logging.Formatter(fmt, datefmt="%m/%d %H:%M:%S"))
        logger.addHandler(fh)
    return logger


@functools.lru_cache(maxsize=None)
def _cached_log_stream(filename: str):
    """Shared buffered text stream for a remote `scheme://` log path.

    1 MB buffering batches the many small log writes into few object-store
    requests (reference utils/logger.py:92-96, iopath's remote buffer).
    Cached so multiple setup_logger calls append to one stream; closed (and
    therefore flushed) at interpreter exit."""
    import fsspec

    try:
        stream = fsspec.open(filename, "a", buffering=1024 * 1024).open()
    except (FileNotFoundError, NotImplementedError):
        # object stores generally can't append (and some raise on a missing
        # target even in append mode) — a fresh object per run is fine
        stream = fsspec.open(filename, "w", buffering=1024 * 1024).open()
    atexit.register(stream.close)
    return stream
