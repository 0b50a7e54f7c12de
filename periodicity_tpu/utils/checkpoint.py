"""Checkpoint / resume for long-running samplers (SURVEY §5.4).

The reference keeps emcee chains only in memory (gp.py:292,483). Here MCMC
state (chains, walker positions, PRNG keys) is a pytree of arrays that can
be saved/resumed; plain .npz keeps zero extra dependencies (orbax remains
compatible since the state is a standard pytree).
"""

import numpy as np
import jax

__all__ = ["save_state", "load_state"]


def _npz_path(path):
    path = str(path)
    return path if path.endswith(".npz") else path + ".npz"


def save_state(path, state):
    """Save a pytree of arrays to an .npz file (the '.npz' extension is
    appended when missing, on BOTH save and load — np.savez appends it
    silently, which otherwise breaks the round trip)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8
    )
    np.savez(_npz_path(path), **arrays)


def load_state(path, like):
    """Load arrays saved by save_state into the structure of `like`.

    The saved tree structure must MATCH ``like``'s: structures with the
    same leaf count but different shapes would otherwise silently swap
    arrays into the wrong slots (corrupted resume)."""
    data = np.load(_npz_path(path))
    leaves, treedef = jax.tree_util.tree_flatten(like)
    if "__treedef__" in data:
        saved = bytes(data["__treedef__"].tobytes()).decode()
        if saved != repr(treedef):
            raise ValueError(
                "checkpoint structure does not match `like`:\n"
                f"  saved: {saved}\n  like:  {treedef!r}"
            )
    new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
