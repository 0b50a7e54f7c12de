"""Core containers and signal operations (L2 of the framework)."""

from .containers import (
    FSeries,
    Signal,
    TFSeries,
    TSeries,
    full_like,
    ones_like,
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
]
