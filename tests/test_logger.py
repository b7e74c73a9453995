"""Logger: local file handler + buffered remote-path streaming
(reference utils/logger.py:83-96 routes `scheme://` paths through iopath
with a 1 MB buffer; this framework uses fsspec)."""

import logging

from maskbit_tpu.utils import logger as logger_mod


def test_local_file_logging(tmp_path):
    path = tmp_path / "sub" / "run.log"
    lg = logger_mod.setup_logger(name="t_local_log", output_file=str(path))
    lg.info("hello local")
    for h in lg.handlers:
        h.flush()
    assert "hello local" in path.read_text()


def test_remote_path_streams_through_fsspec():
    import fsspec

    url = "memory://logs/run.log"
    lg = logger_mod.setup_logger(name="t_remote_log", output_file=url)
    lg.warning("hello remote")
    lg.warning("second line")
    # remote streams buffer (the point: no per-line object-store writes);
    # content is committed on close, as at interpreter exit
    stream = logger_mod._cached_log_stream(url)
    stream.close()
    data = fsspec.filesystem("memory").cat("/logs/run.log").decode()
    assert "hello remote" in data and "second line" in data
    # drop the now-closed stream so other tests reusing the url re-open
    logger_mod._cached_log_stream.cache_clear()
