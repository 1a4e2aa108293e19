"""Mauna Loa CO2 composite-kernel study (L6/L7).

Capability parity with the reference's GPstuff scratch ``scrap.m``: the
classic decomposition of the CO2 curve into trend + seasonality + medium-term
variation with the composite kernel

    k = SE·LIN  +  SE·Periodic(1 yr)  +  SE·RQ

(``scrap.m:11-14`` GPML form / ``scrap.m:23-33`` GPstuff form), exact-GP
inference, and marginal-likelihood hyperparameter optimisation (the
reference's ``minimize(hyp, @gp, …, @infExact, …)`` / GPstuff ``gp_optim``).
Here the kernel is built from the :mod:`gpt_tpu.models.exact_gp` algebra and
the NLML is minimised with log-space L-BFGS via
:func:`gpt_tpu.inference.hyper.optimize_hyperparams` — gradients from
``jax.grad`` through the Cholesky, replacing GPstuff's hand-coded derivs.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gpt_tpu.inference.hyper import HyperOptResult, optimize_hyperparams
from gpt_tpu.models.exact_gp import (
    ExactGP, k_prod, k_sum, linear, periodic, rq_iso, se_iso,
)

# hyperparameter vector layout (all positive; optimised in log space):
#  0 noise_var
#  1 ℓ_se1   2 σ_f1  (SE of the SE·LIN trend term)
#  3 ℓ_se2   4 σ_f2  (SE envelope of the seasonal term)
#  5 ℓ_per               (periodic length scale; period fixed at 1 year)
#  6 ℓ_se3   7 σ_f3  8 ℓ_rq  9 α   (SE·RQ medium-term term)
NUM_HYPERS = 10


def composite_kernel(h: jnp.ndarray):
    """The scrap.m composite: SE·LIN + SE·Per + SE·RQ (period pinned to 1)."""
    trend = k_prod(se_iso(h[1], h[2]), linear())
    seasonal = k_prod(se_iso(h[3], h[4]), periodic(h[5], 1.0, 1.0))
    medium = k_prod(se_iso(h[6], h[7]), rq_iso(h[8], 1.0, h[9]))
    return k_sum(trend, seasonal, medium)


class MaunaResult(NamedTuple):
    opt: HyperOptResult
    mu: jnp.ndarray       # predictive mean at X_test (de-meaned scale)
    var: jnp.ndarray      # predictive variance (latent + noise)
    y_mean: jnp.ndarray   # training mean added back for absolute ppm


def run_mauna(
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_star: jnp.ndarray,
    *,
    init: jnp.ndarray | None = None,
    max_steps: int = 150,
) -> MaunaResult:
    """Fit the composite kernel by NLML and forecast at ``x_star`` (years).

    Mirrors scrap.m's flow: centre y, optimise hyperparameters from all-ones
    init (``scrap.m:15``/``:23-33``), predict with ±2σ bands.
    """
    x = jnp.asarray(x)[:, None]
    y = jnp.asarray(y)
    ym = jnp.mean(y)
    yc = y - ym

    def nlml(h):
        gp = ExactGP(kernel=composite_kernel(h), noise_var=h[0])
        return gp.fit(x, yc, jitter=1e-6).nlml

    if init is None:
        init = jnp.ones((NUM_HYPERS,), x.dtype)
    opt = optimize_hyperparams(nlml, init, max_steps=max_steps)

    h = opt.hyperparams
    gp = ExactGP(kernel=composite_kernel(h), noise_var=h[0])
    post = gp.fit(x, yc, jitter=1e-6)
    mu, var = gp.predict_y(post, jnp.asarray(x_star)[:, None])
    return MaunaResult(opt=opt, mu=mu, var=var, y_mean=ym)
