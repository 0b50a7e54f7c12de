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


_TIMER_TICK = [0]


@contextlib.contextmanager
def timer(label=None, sink=None, sync=True):
    """Wall-clock timer that flushes outstanding device work.

    Yields a dict whose 'seconds' key is filled on exit. Assign the
    timed computation's output to ``result['value']`` inside the block
    for the strongest synchronization guarantee: on the TPU relay only a
    VALUE READBACK truly synchronizes (block_until_ready does not, and
    identical-args calls can be cache-served — see CLAUDE.md), so the
    exit path reads back a scalar reduced from ``result['value']`` when
    present, falling back to a fresh unique device scalar.
    """
    result = {"label": label, "seconds": None}
    t0 = time.perf_counter()
    try:
        yield result
    finally:
        if sync:
            import jax.numpy as jnp

            value = result.get("value")
            read_any = False
            if value is not None:
                for leaf in jax.tree_util.tree_leaves(value):
                    leaf = jnp.asarray(leaf)
                    if leaf.size == 0:
                        continue  # empty leaves have nothing to read back
                    float(jnp.real(jnp.ravel(leaf)[0]))
                    read_any = True
            if not read_any:
                _TIMER_TICK[0] += 1
                float(jnp.zeros(()) + _TIMER_TICK[0])
        result["seconds"] = time.perf_counter() - t0
        if sink is not None:
            sink(result)
