"""Logging with the granularity knobs of the reference library.

The reference inherits pyMOR's ``BasicObject`` logger with per-object
``log_level`` constructor args and ``logger.block`` scoped sections
(reference: mor/sketched_reductor.py:26-29, preconditioners/
preconditioned_reductor.py:463). Here: plain :mod:`logging` with a
``log_block`` context manager providing the same scoped narration.
"""

from __future__ import annotations

import logging
from contextlib import contextmanager

_FORMAT = "%(asctime)s %(name)s %(levelname)s: %(message)s"
_configured = False


def _ensure_configured() -> None:
    global _configured
    if not _configured:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        root = logging.getLogger("rla4mor_tpu")
        if not root.handlers:
            root.addHandler(handler)
        root.setLevel(logging.WARNING)
        root.propagate = False
        _configured = True


def get_logger(name: str, level: int | None = None) -> logging.Logger:
    _ensure_configured()
    logger = logging.getLogger(f"rla4mor_tpu.{name}")
    if level is not None:
        logger.setLevel(level)
    return logger


@contextmanager
def log_block(logger: logging.Logger, message: str):
    """Scoped log section (analog of pyMOR ``logger.block``)."""
    logger.info("%s ...", message)
    try:
        yield
    finally:
        logger.info("%s done", message)


def set_log_level(level: int) -> None:
    _ensure_configured()
    logging.getLogger("rla4mor_tpu").setLevel(level)
