"""Structured logging for the pipeline (replaces the reference's prints).

The reference logs with bare Indonesian print() banners captured by a GUI
stdout redirector (reference: app.py:38-52). Here: a standard library logger
with a level-tagged format, quiet by default, and a helper the CLI/GUI use to
turn on verbosity.
"""

from __future__ import annotations

import logging
import sys


def get_logger(name: str = "stegotpu") -> logging.Logger:
    return logging.getLogger(name)


def configure(verbose: bool = False, stream=None) -> None:
    logger = logging.getLogger("stegotpu")
    if logger.handlers:
        logger.handlers.clear()
    handler = logging.StreamHandler(stream or sys.stderr)
    handler.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)-7s %(name)s: %(message)s",
                          datefmt="%H:%M:%S")
    )
    logger.addHandler(handler)
    logger.setLevel(logging.DEBUG if verbose else logging.INFO)
    logger.propagate = False
