"""Logging utilities (parity: ``/root/reference/src/tsfmx/utils/logging.py:5-34``)."""

from __future__ import annotations

from logging import INFO, FileHandler, Formatter, Logger, StreamHandler, getLogger
from pathlib import Path


def setup_logger(
    name: str = "multimodal_timesfm_tpu",
    level: int = INFO,
    log_file: Path | None = None,
    fmt: str = "%(asctime)s - %(name)s - %(levelname)s - %(message)s",
) -> Logger:
    """Create (once) a logger with a stream handler and optional file handler."""
    logger = getLogger(name)
    if logger.handlers:
        return logger

    logger.setLevel(level)
    formatter = Formatter(fmt)

    stream_handler = StreamHandler()
    stream_handler.setFormatter(formatter)
    logger.addHandler(stream_handler)

    if log_file:
        log_file.parent.mkdir(parents=True, exist_ok=True)
        file_handler = FileHandler(log_file)
        file_handler.setFormatter(formatter)
        logger.addHandler(file_handler)

    return logger


def get_logger(name: str = "multimodal_timesfm_tpu") -> Logger:
    return getLogger(name)
