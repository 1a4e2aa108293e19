"""MCMC convergence diagnostics (L7).

The reference leans on Stan/rstan for R-hat / n_eff reporting
(``temperature_uk/tensor2d_kron.r:42-43``, ``california/fullthetamatrix.r:63-64``)
and on visual traceplots (``traceplot.jl``). Here split-R̂ and ESS are
first-class, jittable, and batched over parameter leaves, so cross-chain
convergence can be monitored on-device (a ``pmean``/``all_gather`` over the
chain mesh axis in the sharded setting).

Conventions follow Gelman et al. (BDA3) / Stan: split-R̂ over 2·M half-chains;
ESS via Geyer initial-positive-sequence truncation of chain-averaged
autocorrelations.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _split_chains(x: jnp.ndarray) -> jnp.ndarray:
    """(chains, draws, ...) → (2·chains, draws//2, ...)."""
    C, T = x.shape[0], x.shape[1]
    half = T // 2
    return jnp.concatenate([x[:, :half], x[:, half : 2 * half]], axis=0)


def potential_scale_reduction(samples: jnp.ndarray) -> jnp.ndarray:
    """Split-R̂ for ``samples (chains, draws, ...)``; returns shape ``(...)``.

    R̂ = sqrt((W·(n−1)/n + B/n) / W) with between-/within-chain variances
    over the split half-chains.
    """
    x = _split_chains(samples)
    n = x.shape[1]
    chain_mean = jnp.mean(x, axis=1)  # (2C, ...)
    chain_var = jnp.var(x, axis=1, ddof=1)  # (2C, ...)
    W = jnp.mean(chain_var, axis=0)
    B_over_n = jnp.var(chain_mean, axis=0, ddof=1)
    var_plus = W * (n - 1) / n + B_over_n
    return jnp.sqrt(var_plus / W)


def _autocorr(x: jnp.ndarray) -> jnp.ndarray:
    """Autocorrelation of each chain via FFT; x (chains, draws, ...)."""
    T = x.shape[1]
    xc = x - jnp.mean(x, axis=1, keepdims=True)
    nfft = 2 * T
    f = jnp.fft.rfft(xc, n=nfft, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=1)[:, :T]
    return acov / acov[:, :1]


def effective_sample_size(samples: jnp.ndarray) -> jnp.ndarray:
    """ESS for ``samples (chains, draws, ...)``; returns shape ``(...)``.

    Uses chain-averaged autocorrelations with between-chain correction and a
    monotone initial-positive-sequence estimate over lag pairs.
    """
    x = _split_chains(samples)
    C, T = x.shape[0], x.shape[1]
    rho_chain = _autocorr(x)  # (C, T, ...)
    chain_var = jnp.var(x, axis=1, ddof=1)
    W = jnp.mean(chain_var, axis=0)
    # combined autocovariance: mean over chains of per-chain acov
    acov = rho_chain * chain_var[:, None]
    mean_acov = jnp.mean(acov, axis=0)  # (T, ...)
    chain_mean = jnp.mean(x, axis=1)
    B_over_n = jnp.var(chain_mean, axis=0, ddof=1)
    var_plus = W * (T - 1) / T + B_over_n
    rho = 1.0 - (W - mean_acov) / var_plus  # (T, ...)

    # Geyer: sum adjacent-lag pairs while positive (static-shape masked form).
    Teven = T - (T % 2)
    pair = rho[:Teven].reshape(Teven // 2, 2, *rho.shape[1:]).sum(axis=1)
    pos = pair > 0
    # running "all previous pairs positive" mask
    keep = jnp.cumprod(pos.astype(rho.dtype), axis=0)
    tau = -1.0 + 2.0 * jnp.sum(pair * keep, axis=0)
    tau = jnp.maximum(tau, 1.0 / jnp.log1p(C * T))  # guard tiny/negative
    return C * T / tau


def summarize_chains(samples: jnp.ndarray) -> dict:
    """Mean / sd / split-R̂ / ESS summary for one scalar-leaf sample array."""
    return {
        "mean": jnp.mean(samples, axis=(0, 1)),
        "sd": jnp.std(samples, axis=(0, 1)),
        "rhat": potential_scale_reduction(samples),
        "ess": effective_sample_size(samples),
    }
