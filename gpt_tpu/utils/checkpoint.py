"""Checkpoint / resume (aux subsystem).

The reference persists thinned posterior stores to HDF5 and reloads them in a
fresh session (``kin40kExperiment.jl:88-107``, ``traceplot.jl:56-60``) but has
no mid-run resume. Here a checkpoint captures the full sampler state — params,
PRNG key, step counters, preconditioner — via orbax, so a run resumes exactly
where it stopped; posterior sample stores can be saved alongside.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover - orbax is in the image, but stay safe
    _HAVE_ORBAX = False


def save_checkpoint(path: str, state: Any, *, force: bool = True) -> None:
    """Save a pytree (e.g. ``SGLDState`` or collected samples) to ``path``."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.tree.map(np.asarray, state), force=force)
        ckptr.wait_until_finished()
    else:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        leaves, treedef = jax.tree.flatten(state)
        np.savez(path + ".npz", *[np.asarray(l) for l in leaves])


def load_checkpoint(path: str, like: Any) -> Any:
    """Load a pytree saved by :func:`save_checkpoint`; ``like`` provides the
    structure/dtypes (an abstract or concrete example state)."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        target = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(jax.numpy.shape(a), a.dtype), like
        )
        restored = ckptr.restore(path, target)
        return jax.tree.map(jax.numpy.asarray, restored)
    data = np.load(path + ".npz")
    leaves, treedef = jax.tree.flatten(like)
    return jax.tree.unflatten(
        treedef, [jax.numpy.asarray(data[f"arr_{i}"]) for i in range(len(leaves))]
    )
