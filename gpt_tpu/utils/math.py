"""Math primitives (L0).

Capability parity with the reference's math layer (``GPT_SGLD.jl:8-67``):
stable log-sum-exp, data whitening, RMSE. Whitening is functional here — it
returns the statistics instead of mutating the array in place, so the same
transform can be replayed on test data and predictions can be de-normalised
(the reference recomputes train statistics by hand in every driver, e.g.
``PowerPlantNoTensorExperiment.jl``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax.scipy.special import logsumexp  # re-export; reference: GPT_SGLD.jl:8-11


class Whitening(NamedTuple):
    """Per-column standardisation statistics.

    Reference behaviour: ``datawhitening`` (``GPT_SGLD.jl:62-67``) centres each
    column and scales it to unit *sample* standard deviation (ddof=1, Julia's
    ``std``).
    """

    mean: jnp.ndarray  # (D,)
    std: jnp.ndarray  # (D,)

    def apply(self, X: jnp.ndarray) -> jnp.ndarray:
        return (X - self.mean) / self.std

    def invert(self, X: jnp.ndarray) -> jnp.ndarray:
        return X * self.std + self.mean


def whiten(X: jnp.ndarray, ddof: int = 1) -> tuple[jnp.ndarray, Whitening]:
    """Standardise each column of ``X``; returns (whitened X, statistics)."""
    X = jnp.asarray(X)
    mean = jnp.mean(X, axis=0)
    std = jnp.std(X, axis=0, ddof=ddof)
    stats = Whitening(mean=mean, std=std)
    return stats.apply(X), stats


def rmse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.mean((pred - target) ** 2))
