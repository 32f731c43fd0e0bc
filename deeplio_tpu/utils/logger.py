"""Process-wide logger factory (reference: ``deeplio/common/logger.py``).

The reference exposes a singleton file+console logger used by every stage;
we keep the same shape (one named app logger, optional file sink, level from
config) on top of stdlib logging.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_APP_LOGGER_NAME = "deeplio_tpu"
_configured = False


def get_app_logger(
    filename: Optional[str] = None,
    level: str = "info",
) -> logging.Logger:
    """Return the singleton framework logger, configuring it on first call.

    Subsequent calls return the same logger regardless of arguments, matching
    the reference's get-once semantics.
    """
    global _configured
    logger = logging.getLogger(_APP_LOGGER_NAME)
    if _configured:
        return logger

    logger.setLevel(getattr(logging, level.upper(), logging.INFO))
    fmt = logging.Formatter(
        "[%(asctime)s][%(levelname)s] %(message)s", datefmt="%H:%M:%S"
    )
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if filename:
        os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
        fh = logging.FileHandler(filename)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    _configured = True
    return logger
