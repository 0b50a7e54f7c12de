"""Multi-host (DCN) initialization helpers.

The reference is strictly single-process (its only IPC is
multiprocessing.Pool pipes, reference phase.py:1,69). This module is the
multi-HOST entry point for the mesh/shard_map machinery in this package:
one `jax.distributed.initialize` wrapper with environment-variable
defaults, plus a mesh builder that lays a named axis hierarchy over
[hosts (DCN), chips-per-host (ICI)] so collectives ride the right links.

Design notes (SURVEY §5.8 / the scaling-book recipe):

- Axes that exchange LARGE tensors every step (the ``seq`` axis of the
  sharded GP likelihood, the ``grid`` axis of a sharded periodogram)
  should map to ICI — put them on the fast (minor) mesh dimension.
- Axes with rare/small exchanges (independent light curves on ``batch``,
  MCMC walker blocks) tolerate DCN — put them on the host (major)
  dimension.
- Single process (no coordinator configured) is a silent no-op: every
  helper degrades to the local-device behavior, keeping the zero-config
  single-chip default.
"""

import os

import numpy as np

__all__ = ["initialize_distributed", "multihost_mesh"]


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, local_device_ids=None):
    """Initialize `jax.distributed` from arguments or the standard
    environment (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID, or a TPU pod runtime where jax can auto-detect).

    No-op (returns False) when nothing indicates a multi-process run, so
    library code can call it unconditionally. Returns True when the
    distributed runtime was (or already is) initialized.
    """
    import jax

    try:
        # private introspection; tolerated loss across jax upgrades — the
        # fallback just means a redundant initialize() raises visibly
        state = getattr(jax._src.distributed, "global_state", None)
        if state is not None and getattr(state, "client", None) is not None:
            return True  # already initialized
    except AttributeError:
        pass

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None:
        return False  # single process: stay zero-config

    too_late = False
    try:
        from jax._src import xla_bridge

        too_late = xla_bridge.backends_are_initialized()
    except (ImportError, AttributeError):
        pass  # private API moved: fall through and let initialize decide
    if too_late:
        # jax.distributed.initialize must precede any backend use; a
        # coordinator WAS configured, so running single-process is a
        # misconfiguration worth flagging, not a silent degradation
        import warnings

        warnings.warn(
            "initialize_distributed called after the jax backend was "
            "initialized; the configured coordinator "
            f"{coordinator_address!r} is ignored and this process runs "
            "single-process. Call initialize_distributed() before any "
            "jax device use.",
            RuntimeWarning,
            stacklevel=2,
        )
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def multihost_mesh(ici_axes=("grid",), dcn_axes=("batch",), ici_shape=None,
                   dcn_shape=None):
    """Mesh over ALL processes' devices with DCN (host) axes major and ICI
    (intra-host) axes minor, so shardings over the ICI axes exchange over
    the fast links and only the DCN axes cross hosts.

    Defaults: one DCN axis of size n_processes (or 1), ICI axes over the
    local device count. With a single process this reduces to
    ``default_mesh`` behavior plus a leading size-1 host axis per
    ``dcn_axes`` entry.
    """
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    n_local = jax.local_device_count()
    n_hosts = max(1, len(devices) // max(n_local, 1))
    if dcn_shape is None:
        dcn_shape = (n_hosts,) + (1,) * (len(dcn_axes) - 1)
    if ici_shape is None:
        ici_shape = (n_local,) + (1,) * (len(ici_axes) - 1)
    shape = tuple(dcn_shape) + tuple(ici_shape)
    if int(np.prod(shape)) != devices.size:
        raise ValueError(
            f"mesh shape {shape} does not cover {devices.size} devices"
        )
    if n_hosts > 1:
        # topology-aware placement: jax.devices() ordering is not
        # guaranteed process-contiguous, and the ICI axes MUST NOT span
        # hosts — delegate to the hybrid mesh builder, which groups by
        # process and slice topology
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            tuple(ici_shape), tuple(dcn_shape), devices=list(devices)
        )
        # hybrid layout is [dcn..., ici...] — matches our axis order
        return Mesh(dev_array, tuple(dcn_axes) + tuple(ici_axes))
    return Mesh(devices.reshape(shape), tuple(dcn_axes) + tuple(ici_axes))
