"""Global ``dynode_tpu`` logger configuration.

(reference: src/dynode/utils/log.py:17-111). One process-global logger with
console/file/both output modes and a per-run timestamped logfile.
"""

import logging
import os
from datetime import datetime
from typing import Literal

from .custom_log_formatter import CustomLogFormatter

logger = logging.getLogger("dynode_tpu")

_FMT = "%(asctime)s - %(name)s - %(levelname)s - %(funcName)s - %(message)s"


def use_logging(
    level: int = logging.INFO,
    output: Literal["file", "console", "both"] = "console",
    log_path: str = "./logs",
) -> logging.Logger:
    """Configure (and return) the global logger.

    Parameters
    ----------
    level : int
        A ``logging`` level (e.g. ``logging.DEBUG``).
    output : {"file", "console", "both"}
        Where log records go. File output creates ``log_path`` if needed and
        writes a per-run timestamped logfile.
    log_path : str
        Directory for logfiles when file output is requested.
    """
    if output not in ("file", "console", "both"):
        raise ValueError(
            f"output must be one of 'file', 'console', 'both'; got {output!r}"
        )
    logger.setLevel(level)
    logger.handlers.clear()
    formatter = CustomLogFormatter(_FMT)

    if output in ("console", "both"):
        console = logging.StreamHandler()
        console.setLevel(level)
        console.setFormatter(formatter)
        logger.addHandler(console)
    if output in ("file", "both"):
        os.makedirs(log_path, exist_ok=True)
        stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        fh = logging.FileHandler(
            os.path.join(log_path, f"dynode_tpu_{stamp}.log")
        )
        fh.setLevel(level)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    return logger


__all__ = ["use_logging", "logger"]
