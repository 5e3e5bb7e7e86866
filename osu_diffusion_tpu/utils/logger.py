"""Rank-0 logging with the reference's exact format.

The log line format is load-bearing: testing/plot_loss.py scrapes
"Train Loss: <x>, Train Steps/Sec: <y>" by fixed offsets (reference
plot_loss.py:30-37, train.py:73-91), so we keep the ANSI-timestamped layout.
"""
from __future__ import annotations

import logging


def create_logger(logging_dir: str | None, rank: int = 0) -> logging.Logger:
    logger = logging.getLogger("osu_diffusion_tpu")
    logger.handlers.clear()
    logger.propagate = False
    if rank == 0:
        logger.setLevel(logging.INFO)
        fmt = logging.Formatter(
            "[\033[34m%(asctime)s\033[0m] %(message)s", datefmt="%Y-%m-%d %H:%M:%S"
        )
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if logging_dir is not None:
            fh = logging.FileHandler(f"{logging_dir}/log.txt")
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
    return logger
