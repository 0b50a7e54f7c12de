"""Checkpoint / resume for long-running samplers (SURVEY §5.4).

The reference keeps emcee chains only in memory (gp.py:292,483). Here MCMC
state (chains, walker positions, PRNG keys) is a pytree of arrays that can
be saved/resumed; plain .npz keeps zero extra dependencies (orbax remains
compatible since the state is a standard pytree).
"""

import numpy as np
import jax

__all__ = ["save_state", "load_state"]


def save_state(path, state):
    """Save a pytree of arrays to an .npz file."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_state(path, like):
    """Load arrays saved by save_state into the structure of `like`."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
