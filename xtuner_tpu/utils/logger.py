"""Rank-tagged logging.

Capability parity with the reference's loguru logger (xtuner/v1/utils/logger.py):
one process-wide logger whose records carry the jax process index so multihost
logs interleave legibly. Uses stdlib logging (loguru is not a dependency).
"""

from __future__ import annotations

import logging
import os
import sys

_LOGGER: logging.Logger | None = None

_FORMAT = "[XTuner][RANK %(rank)s][%(asctime)s][%(levelname)s] %(message)s"


class _RankFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:
        if not hasattr(record, "rank"):
            record.rank = os.environ.get("XTUNER_RANK", "0")
        return True


def get_logger(level: str | int | None = None) -> logging.Logger:
    global _LOGGER
    if _LOGGER is None:
        logger = logging.getLogger("xtuner_tpu")
        logger.propagate = False
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%Y-%m-%d %H:%M:%S"))
        handler.addFilter(_RankFilter())
        logger.addHandler(handler)
        logger.setLevel(level or os.environ.get("XTUNER_LOG_LEVEL", "INFO"))
        _LOGGER = logger
    if level is not None:
        _LOGGER.setLevel(level)
    return _LOGGER


def set_rank(rank: int) -> None:
    """Record the process rank used in every subsequent log line."""
    os.environ["XTUNER_RANK"] = str(rank)


def log_file_handler(path: str) -> None:
    """Additionally mirror logs to ``path`` (one file per rank, like the
    reference's per-rank ``rank{N}.log``)."""
    logger = get_logger()
    handler = logging.FileHandler(path)
    handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%Y-%m-%d %H:%M:%S"))
    handler.addFilter(_RankFilter())
    logger.addHandler(handler)
