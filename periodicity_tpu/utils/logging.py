"""Structured logging of estimator runs (grid sizes, iteration counts,
convergence flags) — SURVEY §5.5.

Estimators call ``log_event`` at entry/exit with their run parameters.
Events are JSON lines on the ``periodicity_tpu`` logger at INFO level;
the library is quiet by default (WARNING threshold, standard library
practice) — call ``set_verbosity("info")`` or configure the logger to see
them.
"""

import json
import logging

__all__ = ["get_logger", "log_event", "set_verbosity"]

_LOGGER = None


def get_logger():
    global _LOGGER
    if _LOGGER is None:
        logger = logging.getLogger("periodicity_tpu")
        if not logger.handlers:
            # actual standard library practice: a NullHandler, so the
            # library never injects output into host applications and
            # never double-emits once the app configures root logging
            logger.addHandler(logging.NullHandler())
        logger.setLevel(logging.WARNING)
        _LOGGER = logger
    return _LOGGER


def set_verbosity(level="info"):
    """Set the event-log threshold ('debug'|'info'|'warning'|...) and
    attach the library's own stderr handler (propagation is disabled at
    that point so records are not ALSO emitted via the root logger)."""
    logger = get_logger()
    if not any(
        isinstance(h, logging.StreamHandler) for h in logger.handlers
    ):
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(name)s %(levelname)s %(message)s")
        )
        logger.addHandler(handler)
        logger.propagate = False
    logger.setLevel(getattr(logging, level.upper()))


def log_event(event, **fields):
    """Emit one structured (JSON) log line, e.g.
    log_event("gls", n=1e5, nf=1e6, nfft=2**23)."""
    logger = get_logger()
    if logger.isEnabledFor(logging.INFO):
        logger.info(json.dumps({"event": event, **fields}, default=str))
