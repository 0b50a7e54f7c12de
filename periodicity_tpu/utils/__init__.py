"""Auxiliary subsystems: profiling, structured logging, checkpointing.

The reference has none of these (SURVEY §5: tqdm progress bars only); they
are first-class here because a TPU framework is operated, not just run.
"""

from .checkpoint import load_state, save_state
from .logging import get_logger, log_event, set_verbosity
from .profiling import timer, trace

__all__ = ["trace", "timer", "get_logger", "log_event",
           "set_verbosity", "save_state", "load_state"]
