"""Coordinate-ascent variational inference for the tensor model (L3).

Capability parity with ``inf.R::inf_VI`` (``inf.R:166-275``): mean-field-in-
blocks Gaussian approximation with

- ``q(w) = N(μ_w, Σ_w)`` — full Q×Q covariance,
- ``q(U^(k)_{·l}) = N(μ_{lk}, Σ_{lk})`` — one n-vector mean and n×n covariance
  per factor column,

updated in closed form by coordinate ascent on the ELBO. The second-moment
tensor ``E_q[V_q V_{q'}]`` per datapoint (the R code's O(N·Q²·D) nested loops,
``inf.R:190-215``) is computed here as one broadcasted product over gathered
mean/variance tables — no loops over data or core entries.

Priors follow the reference: ``w ~ N(0, σ_w²)`` with σ_w=√(rᴰ/Q),
``U columns ~ N(0, σ_u²)`` with σ_u=√(1/r). (The R code anchors the U prior
mean at the random initialisation, ``inf.R:262`` — an idiosyncrasy, not
reproduced; pass ``prior_mean_U`` to restore it.)
"""
from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class VIState(NamedTuple):
    mu_w: jnp.ndarray  # (Q,)
    sigma_w: jnp.ndarray  # (Q, Q)
    mu_U: jnp.ndarray  # (D, n, r) column means
    sigma_U: jnp.ndarray  # (D, r, n, n) column covariances
    elbo_fit: jnp.ndarray  # (N,) current posterior-mean fit


@dataclasses.dataclass(frozen=True)
class VIConfig:
    sigma_w: float | None = None  # default √(rᴰ/Q)
    sigma_u: float | None = None  # default √(1/r)
    jitter: float = 1e-8


def init_vi(key: jax.Array, n: int, r: int, D: int, Q: int,
            config: VIConfig = VIConfig(), dtype=jnp.float32) -> VIState:
    su = config.sigma_u if config.sigma_u is not None else math.sqrt(1.0 / r)
    mu_U = su * jax.random.normal(key, (D, n, r), dtype)
    sigma_U = jnp.broadcast_to(su * jnp.eye(n, dtype=dtype), (D, r, n, n))
    return VIState(
        mu_w=jnp.zeros((Q,), dtype),
        sigma_w=jnp.eye(Q, dtype=dtype),
        mu_U=mu_U,
        sigma_U=jnp.asarray(sigma_U),
        elbo_fit=jnp.zeros((0,), dtype),
    )


def _tables(phi, mu_U, sigma_U, I):
    """Per-datum mean/variance tables and their core-gathered versions.

    mdot (N, D, r) = bᵀμ;  svar (N, D, r) = bᵀΣb;
    G, S (N, D, Q) gathered at the core locations I.
    """
    mdot = jnp.einsum("idn,dnl->idl", phi, mu_U)
    svar = jnp.einsum("idn,dlnm,idm->idl", phi, sigma_U, phi)
    idx = jnp.broadcast_to(I.T.astype(jnp.int32), mdot.shape[:-1] + (I.shape[0],))
    G = jnp.take_along_axis(mdot, idx, axis=-1)
    S = jnp.take_along_axis(svar, idx, axis=-1)
    return G, S


def _second_moment(G, S, I):
    """M2[i, q, q'] = E_q[V_q(x_i) V_{q'}(x_i)] (inf.R:190-205)."""
    eq = (I[:, None, :] == I[None, :, :]).transpose(2, 0, 1)  # (D, Q, Q)
    fac = (
        G[:, :, :, None] * G[:, :, None, :]
        + eq[None] * S[:, :, :, None]
    )  # (N, D, Q, Q)
    return jnp.prod(fac, axis=1), fac


def vi_step(
    state: VIState,
    phi: jnp.ndarray,  # (N, D, n)
    y: jnp.ndarray,
    I: jnp.ndarray,  # (Q, D)
    signal_var: float,
    config: VIConfig = VIConfig(),
) -> VIState:
    """One full coordinate-ascent sweep: update q(w), then every q(U-column)."""
    N, D, n = phi.shape
    Q = I.shape[0]
    r = state.mu_U.shape[-1]
    sv = signal_var
    sw = config.sigma_w if config.sigma_w is not None else math.sqrt(r**D / Q)
    su = config.sigma_u if config.sigma_u is not None else math.sqrt(1.0 / r)
    eye_q = jnp.eye(Q, dtype=phi.dtype)
    eye_n = jnp.eye(n, dtype=phi.dtype)

    mu_U, sigma_U = state.mu_U, state.sigma_U

    # ---- q(w) ------------------------------------------------------------
    G, S = _tables(phi, mu_U, sigma_U, I)
    M2, _ = _second_moment(G, S, I)
    EV = jnp.prod(G, axis=1)  # (N, Q) mean of V
    prec_w = jnp.sum(M2, axis=0) / sv + eye_q / sw**2
    sigma_w_new = jnp.linalg.inv(prec_w + config.jitter * eye_q)
    mu_w = sigma_w_new @ (EV.T @ y) / sv

    # ---- q(U^(k)_{·l}) for every (k, l) in turn ---------------------------
    # Scan-ified coordinate ascent (round-2): the per-datum mean/variance
    # tables (mdot/svar, (N, D, r)) are the incremental state — a column
    # update changes exactly one table column (one matvec / one quadratic
    # form), and the leave-k-out pair factors are constant across a factor's
    # whole column block, so the O(N·D·Q²) second-moment product is built
    # once per factor instead of once per column (the round-1 Python loop
    # rebuilt everything D·r times per sweep).
    Ew2 = mu_w[:, None] * mu_w[None, :] + sigma_w_new  # (Q, Q)
    It = I.T.astype(jnp.int32)  # (D, Q)
    eqD = (I[:, None, :] == I[None, :, :]).transpose(2, 0, 1)  # (D, Q, Q)
    dim_ids = jnp.arange(D, dtype=jnp.int32)
    mdot = jnp.einsum("idn,dnl->idl", phi, mu_U)  # (N, D, r)
    svar = jnp.einsum("idn,dlnm,idm->idl", phi, sigma_U, phi)  # (N, D, r)

    def factor_block(carry, inputs):
        mdot, svar = carry
        k, mu_k_old, sigma_k_old = inputs  # (n, r), (r, n, n)
        idx = jnp.broadcast_to(It, mdot.shape[:-1] + (Q,))
        G = jnp.take_along_axis(mdot, idx, axis=-1)  # (N, D, Q)
        S = jnp.take_along_axis(svar, idx, axis=-1)
        fac = G[:, :, :, None] * G[:, :, None, :] + eqD[None] * S[:, :, :, None]
        keep = (dim_ids != k)[None, :, None, None]
        loo_fac = jnp.prod(jnp.where(keep, fac, 1.0), axis=1)  # (N, Q, Q)
        loo = jnp.prod(
            jnp.where((dim_ids != k)[None, :, None], G, 1.0), axis=1
        )  # (N, Q)
        phik = jnp.take(phi, k, axis=1)  # (N, n)
        Ik = jnp.take(I, k, axis=1).astype(jnp.int32)  # (Q,)

        def update_column(carry_k, inp):
            mdot_k, svar_k = carry_k  # (N, r) each — dim-k tables
            l, mu_old, cov_old = inp  # (n,), (n, n)
            in_l = Ik == l
            fl = in_l.astype(phi.dtype)
            Gkl = jnp.take(mdot_k, Ik, axis=1)  # (N, Q) current dim-k means
            mask2 = jnp.where(in_l[:, None] & in_l[None, :], Ew2, 0.0)
            cross = jnp.where(in_l[:, None] & (~in_l)[None, :], Ew2, 0.0)
            # E[a²]: Σ_{q,q'∈l} Ew2·Π_{d≠k}fac_d (both share the l column)
            Ea2 = jnp.maximum(jnp.einsum("iqp,qp->i", loo_fac, mask2), 0.0)
            # Ea: mean of a = Σ_{q∈l} w_q Π_{d≠k} G_d
            Ea = loo @ (mu_w * fl)
            # Eab: cross term with q' outside the column — keep q''s own
            # dim-k mean factor (pair factor G_q·G_p with G_q removed)
            Eab = jnp.einsum("iqp,ip,qp->i", loo_fac, Gkl, cross)
            Phi = jnp.sqrt(Ea2)[:, None] * phik  # (N, n)
            prec = Phi.T @ Phi / sv + eye_n / su**2
            rhs = phik.T @ (y * Ea - Eab) / sv
            cov = jnp.linalg.inv(prec + config.jitter * eye_n)
            mu_col = cov @ rhs
            # a column no core entry uses keeps its old q (the round-1
            # host-side `continue`)
            used = jnp.any(in_l)
            mu_col = jnp.where(used, mu_col, mu_old)
            cov = jnp.where(used, cov, cov_old)
            mdot_k = mdot_k.at[:, l].set(phik @ mu_col)
            svar_k = svar_k.at[:, l].set(
                jnp.einsum("in,nm,im->i", phik, cov, phik)
            )
            return (mdot_k, svar_k), (mu_col, cov)

        carry_k0 = (jnp.take(mdot, k, axis=1), jnp.take(svar, k, axis=1))
        (mdot_k, svar_k), (mu_cols, covs) = jax.lax.scan(
            update_column, carry_k0,
            (jnp.arange(r, dtype=jnp.int32), mu_k_old.T, sigma_k_old),
        )
        mdot = mdot.at[:, k, :].set(mdot_k)
        svar = svar.at[:, k, :].set(svar_k)
        return (mdot, svar), (mu_cols.T, covs)  # (n, r), (r, n, n)

    (mdot, svar), (mu_U, sigma_U) = jax.lax.scan(
        factor_block, (mdot, svar), (dim_ids, mu_U, sigma_U)
    )

    idx = jnp.broadcast_to(It, mdot.shape[:-1] + (Q,))
    G = jnp.take_along_axis(mdot, idx, axis=-1)
    fit = jnp.prod(G, axis=1) @ mu_w
    return VIState(mu_w=mu_w, sigma_w=sigma_w_new, mu_U=mu_U, sigma_U=sigma_U,
                   elbo_fit=fit)


def run_vi(
    key: jax.Array,
    phi: jnp.ndarray,
    y: jnp.ndarray,
    I: jnp.ndarray,
    signal_var: float,
    *,
    num_iterations: int,
    config: VIConfig = VIConfig(),
) -> VIState:
    """Run coordinate-ascent VI; returns the final variational state.

    The whole run is ONE jitted ``lax.scan`` over sweeps (round-2: the
    round-1 version Python-looped un-jitted sweeps).
    """
    N, D, n = phi.shape
    r = int(I.max()) + 1
    state = init_vi(key, n, r, D, I.shape[0], config, dtype=phi.dtype)
    state = state._replace(elbo_fit=jnp.zeros_like(y))  # static carry shape

    @jax.jit
    def run(state):
        def body(s, _):
            return vi_step(s, phi, y, I, signal_var, config), None

        final, _ = jax.lax.scan(body, state, None, length=num_iterations)
        return final

    return run(state)
