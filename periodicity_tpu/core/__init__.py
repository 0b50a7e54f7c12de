"""Core containers and signal operations (L2 of the framework)."""

from .containers import FSeries, Signal, TFSeries, TSeries

__all__ = ["TSeries", "FSeries", "TFSeries", "Signal"]
