"""Minimal `[LEVEL] message` stdout logger — the reference's logimpl
(reference: src/logimpl.rs:1-24: Debug level, plain prefix format)."""

from __future__ import annotations

import logging
import sys

_FORMAT = "[%(levelname)s] %(message)s"


def initialize(level: int = logging.DEBUG) -> logging.Logger:
    """reference: logimpl.rs:21 `initialize()`."""
    logger = logging.getLogger("spacetime_tpu")
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
    logger.setLevel(level)
    logger.propagate = False
    return logger


def get() -> logging.Logger:
    return logging.getLogger("spacetime_tpu")
