"""Structured logging of estimator runs (grid sizes, iteration counts,
convergence flags) — SURVEY §5.5."""

import json
import logging

__all__ = ["get_logger", "log_event"]

_LOGGER = None


def get_logger():
    global _LOGGER
    if _LOGGER is None:
        logger = logging.getLogger("periodicity_tpu")
        if not logger.handlers:
            handler = logging.StreamHandler()
            handler.setFormatter(logging.Formatter("%(name)s %(levelname)s %(message)s"))
            logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        _LOGGER = logger
    return _LOGGER


def log_event(event, **fields):
    """Emit one structured (JSON) log line, e.g.
    log_event("gls", n=1e5, nf=1e6, nfft=2**23)."""
    get_logger().info(json.dumps({"event": event, **fields}, default=str))
