"""Logger setup — file + stdout, reference-compatible format
(reference: py/standard_logger.py:5-28)."""

from __future__ import annotations

import logging
import sys


def get_logger(log_file: str, logger_name: str = "SD-TPU", level=logging.DEBUG) -> logging.Logger:
    logger = logging.getLogger(logger_name)
    logger.setLevel(level)
    if logger.handlers:
        return logger
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    fh = logging.FileHandler(log_file, mode="a")
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    return logger
