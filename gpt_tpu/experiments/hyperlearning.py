"""Hyperparameter-learning drivers (L5).

Capability parity with the reference's hyperparameter workflows:

- :func:`learn_rff_hyperparams` — ``GPNT_hyperparameters`` /
  ``GPNT_hyperparameters_optim`` (``GPT_SGLD.jl:971-1002``): optimise
  ``(signal_var, sigma_RBF, length_scale…)`` of the no-tensor RFF model by
  NLML (the Woodbury n×n form) with gradients through the feature map —
  ``jax.grad`` replaces ``GPNT_gradnlogmarginal``'s hand chain.
- :func:`learn_exact_gp_hyperparams` — the GPstuff/GPkit exact-GP tuning of
  ``powerplant_hyperparams.m`` / ``DataRecords.txt:837-840``.
- :func:`stochastic_em_classification` — ``GPNT_hyperparameters_ng`` with a
  softmax likelihood (the ``testng`` loops of ``BloodTransfusionExperiment.jl``
  and ``ImageExperiment.jl``): SGLD E-step on θ, gradient M-step on
  ``(length_scale, sigma_RBF)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gpt_tpu.features import FullRFF, full_features
from gpt_tpu.inference.hyper import (
    HyperOptResult,
    StochasticEMConfig,
    gp_nlml,
    optimize_hyperparams,
    rff_nlml,
    stochastic_em,
)
from jax.scipy.special import logsumexp


def learn_rff_hyperparams(
    X: jnp.ndarray,
    y: jnp.ndarray,
    rff: FullRFF,
    init: jnp.ndarray,  # [signal_var, sigma_RBF, ℓ…] (scalar or ARD tail)
    *,
    max_steps: int = 100,
) -> HyperOptResult:
    """Optimise RFF-GP hyperparameters; ``hyperparams[-0:]`` layout matches
    the reference convention with signal_var FIRST here (documented divergence
    from "always hyperparams[end]" — explicit index beats convention)."""

    def nlml(h):
        phi = full_features(X, rff, h[2:], h[1])
        return rff_nlml(phi, y, h[0])

    return optimize_hyperparams(nlml, init, max_steps=max_steps)


def learn_exact_gp_hyperparams(
    X: jnp.ndarray,
    y: jnp.ndarray,
    init: jnp.ndarray,  # [signal_var, sigma_RBF², ℓ…]
    *,
    max_steps: int = 100,
) -> HyperOptResult:
    def nlml(h):
        return gp_nlml(X, y, h[0], h[1], h[2:])

    return optimize_hyperparams(nlml, init, max_steps=max_steps)


def stochastic_em_classification(
    key: jax.Array,
    X: jnp.ndarray,
    y: jnp.ndarray,  # int labels (N,)
    rff: FullRFF,
    num_classes: int,
    init_hyper: jnp.ndarray,  # [length_scale(s)…, sigma_RBF]
    *,
    sigma_theta: float = 1.0,
    config: StochasticEMConfig = StochasticEMConfig(),
):
    """Stochastic EM for softmax-classification hyperparameters.

    θ is the flattened (C, n) class-weight matrix; −log p(y, θ | η) is the
    softmax negative log likelihood + Gaussian prior, with features rebuilt
    from the hyperparameters each evaluation (the reference's
    ``neglogjointlkhd`` closure, ``BloodTransfusionExperiment.jl``).
    """
    n = rff.Z.shape[0]
    C = num_classes
    yi = y.astype(jnp.int32)

    def neg_log_joint(theta_flat, hyper):
        ls, s = hyper[:-1], hyper[-1]
        phi = full_features(X, rff, ls, s)  # (N, n)
        theta = theta_flat.reshape(C, n)
        f = phi @ theta.T  # (N, C)
        fy = jnp.take_along_axis(f, yi[:, None], axis=1)[:, 0]
        nll = -jnp.sum(fy - logsumexp(f, axis=1))
        return nll + 0.5 * jnp.sum(theta_flat**2) / sigma_theta**2

    theta0 = jnp.zeros((C * n,), X.dtype)
    return stochastic_em(key, theta0, init_hyper, neg_log_joint=neg_log_joint,
                         config=config)
