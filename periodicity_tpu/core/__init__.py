"""Core containers and signal operations (L2 of the framework)."""

from .containers import (
    FSeries,
    Signal,
    TFSeries,
    TSeries,
    full_like,
    implements,
    ones_like,
    wrap_reduce,
    zeros_like,
)

__all__ = [
    "TSeries",
    "FSeries",
    "TFSeries",
    "Signal",
    "full_like",
    "zeros_like",
    "ones_like",
    "implements",
    "wrap_reduce",
]
