"""Profiling helpers: jax.profiler traces + wall-clock timers."""

import contextlib
import time

import jax

__all__ = ["trace", "timer"]


@contextlib.contextmanager
def trace(logdir):
    """Capture a jax.profiler trace (view with TensorBoard/Perfetto).

    >>> with trace("/tmp/periodicity-trace"):   # doctest: +SKIP
    ...     gls_power(...).block_until_ready()
    """
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timer(label=None, sink=None, sync=True):
    """Wall-clock timer that blocks on outstanding device work.

    Yields a dict whose 'seconds' key is filled on exit.
    """
    result = {"label": label, "seconds": None}
    t0 = time.perf_counter()
    try:
        yield result
    finally:
        if sync:
            # a trivial device computation serializes behind outstanding work
            import jax.numpy as jnp

            (jnp.zeros(()) + 0).block_until_ready()
        result["seconds"] = time.perf_counter() - t0
        if sink is not None:
            sink(result)
