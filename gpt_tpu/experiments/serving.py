"""Posterior-predictive serving (L5, production path).

The reference's "serving" is offline: reload HDF5 sample stores and average
predictions in a fresh session (``kin40kExperiment.jl:93-107``,
``traceplot.jl:56-60``). Here serving is a first-class jitted path: a
:class:`PosteriorPredictor` holds a thinned stack of posterior samples
(from any sampler's ``collected`` output or a checkpoint) and evaluates the
MC posterior-predictive mean/variance for request batches in one fused
program — chunked over requests so arbitrarily large batches stream through
fixed-shape compiled code.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class PredictResult(NamedTuple):
    mean: jnp.ndarray  # (N,) posterior-predictive mean of f
    var: jnp.ndarray  # (N,) MC variance of f (add signal_var for y-variance)


class PosteriorPredictor:
    """Jitted MC posterior-predictive evaluation over stored samples.

    ``predict_fn(params, inputs) -> (..., batch)`` is the model's predict;
    ``samples`` is a pytree with a leading sample axis (T thinned draws, or
    chains×draws flattened by the caller).
    """

    def __init__(self, predict_fn: Callable, samples: Any, chunk: int = 4096):
        self.samples = samples
        self.chunk = chunk

        @jax.jit
        def _eval(samples, inputs):
            preds = jax.vmap(lambda p: predict_fn(p, inputs))(samples)  # (T, m)
            return preds.mean(axis=0), preds.var(axis=0)

        self._eval = _eval

    def __call__(self, inputs) -> PredictResult:
        leaves = jax.tree.leaves(inputs)
        N = leaves[0].shape[0]
        c = self.chunk
        means, vars_ = [], []
        for start in range(0, N, c):
            block = jax.tree.map(lambda a: a[start : start + c], inputs)
            bn = jax.tree.leaves(block)[0].shape[0]
            if bn < c:  # always pad to the chunk: ONE compiled shape serves
                # every request size (per-size jit compiles would stall the
                # latency path)
                # pad to the fixed chunk shape to avoid a recompile
                block = jax.tree.map(
                    lambda a: jnp.concatenate(
                        [a, jnp.zeros((c - bn, *a.shape[1:]), a.dtype)], axis=0
                    ),
                    block,
                )
            mu, var = self._eval(self.samples, block)
            means.append(mu[:bn])
            vars_.append(var[:bn])
        return PredictResult(
            mean=jnp.concatenate(means), var=jnp.concatenate(vars_)
        )
