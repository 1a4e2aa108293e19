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
    # Masks come from the host-side core table so the whole step is jittable
    # (I is static per model); leave-one-out factors use zero-safe
    # prefix/suffix products instead of dividing the full product.
    import numpy as np

    from gpt_tpu.ops.contraction import leave_one_out_products

    I_np = np.asarray(I)
    Ew2 = mu_w[:, None] * mu_w[None, :] + sigma_w_new  # (Q, Q)
    for k in range(D):
        for l in range(r):
            in_l_np = I_np[:, k] == l  # (Q,) host-static mask
            if not in_l_np.any():
                continue
            in_l = jnp.asarray(in_l_np)
            G, S = _tables(phi, mu_U, sigma_U, I)
            _, fac = _second_moment(G, S, I)
            loo_fac = leave_one_out_products(fac, axis=1)[:, k]  # (N, Q, Q)
            Gkl = G[:, k, :]  # (N, Q) means at dim k
            mask2 = in_l[:, None] & in_l[None, :]
            cross = in_l[:, None] & (~in_l)[None, :]

            # E[a²]: Σ_{q,q'∈l} Ew2·Π_{d≠k}fac_d  (both share the l column)
            Ea2 = jnp.einsum(
                "iqp,qp->i", loo_fac, jnp.where(mask2, Ew2, 0.0)
            )
            # Ea: mean of a = Σ_{q∈l} w_q Π_{d≠k} G_d
            loo = leave_one_out_products(G, axis=1)[:, k]  # (N, Q)
            Ea = jnp.einsum("iq,q->i", loo, mu_w * in_l)
            # Eab: cross term with q' outside the column — keep q''s own
            # dim-k mean factor (pair factor G_q·G_p with G_q removed)
            Eab = jnp.einsum(
                "iqp,ip,qp->i", loo_fac, Gkl, jnp.where(cross, Ew2, 0.0)
            )

            Ea2 = jnp.maximum(Ea2, 0.0)
            Phi = jnp.sqrt(Ea2)[:, None] * phi[:, k, :]  # (N, n)
            prec = Phi.T @ Phi / sv + eye_n / su**2
            rhs = phi[:, k, :].T @ (y * Ea - Eab) / sv
            cov = jnp.linalg.inv(prec + config.jitter * eye_n)
            mu_col = cov @ rhs
            mu_U = mu_U.at[k, :, l].set(mu_col)
            sigma_U = sigma_U.at[k, l].set(cov)

    G, _ = _tables(phi, mu_U, sigma_U, I)
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
    """Run coordinate-ascent VI; returns the final variational state."""
    N, D, n = phi.shape
    r = int(I.max()) + 1
    state = init_vi(key, n, r, D, I.shape[0], config, dtype=phi.dtype)
    for _ in range(num_iterations):
        state = vi_step(state, phi, y, I, signal_var, config)
    return state
