"""Conjugate Gibbs sampling for the tensor model (L3).

Capability parity with ``TGP.GPT_inf`` (``TGP.jl:37-86``) and the R
``GPT_inf`` (``inf.R:4-89``): alternate exact Gaussian draws of

- the core ``w | U`` from the Q×Q system
  ``Λ_w = VVᵀ/σ² + I/σ_w²``, ``μ_w = Λ_w⁻¹ V y / σ²``;
- each factor ``vec(U^(k)) | w, U^(−k)`` from the nr×nr system built from
  ``Ψ^(k)[(l,j), i] = C^(k)[l, i] · φ^(k)_j(x_i)`` where
  ``C^(k)[l, i] = Σ_{q: I[q,k]=l} w_q · Π_{k'≠k} ⟨φ^(k')(x_i), U^(k')_{·,I[q,k']}⟩``.

Priors follow TGP.jl: Gaussian factors ``U ~ N(0, σ_u²)`` (σ_u=√(1/r)) — the
Gibbs model is the non-Stiefel variant — and ``w ~ N(0, σ_w²)`` (σ_w=√(rᴰ/Q)).

TPU-first: the per-dimension leave-one-out products come from one forward
``phidot`` plus a gather (no recomputation per k), the scatter-sum over core
indices is a ``segment_sum``, and both Gaussian draws are Cholesky
solves — batched MXU work. The whole sweep is jittable and vmappable over
chains.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from gpt_tpu.models.tensor_gp import TensorGP, TensorGPParams
from gpt_tpu.ops.contraction import leave_one_out_products, phidot


@dataclasses.dataclass(frozen=True)
class GibbsConfig:
    sigma_w: float | None = None  # default √(rᴰ/Q) (TGP.jl:52)
    sigma_u: float | None = None  # default √(1/r)  (TGP.jl:51)
    jitter: float = 1e-6


def _mvn_from_precision(key, precision, mean_rhs):
    """Draw x ~ N(Λ⁻¹ b, Λ⁻¹) given precision Λ and rhs b = Λ μ.

    Uses the Cholesky Λ = L Lᵀ: μ = Λ⁻¹ b and x = μ + L⁻ᵀ ξ
    (the reference's ``\\(chol(invSigma,:U), randn(q)) + Mu``, TGP.jl:63).
    """
    L = jnp.linalg.cholesky(precision)
    mu = jax.scipy.linalg.cho_solve((L, True), mean_rhs)
    xi = jax.random.normal(key, mean_rhs.shape, mean_rhs.dtype)
    x = mu + jax.scipy.linalg.solve_triangular(L, xi, trans="T", lower=True)
    return x


def gibbs_sweep(
    model: TensorGP,
    params: TensorGPParams,
    key: jax.Array,
    phi: jnp.ndarray,  # (N, D, n)
    y: jnp.ndarray,  # (N,)
    config: GibbsConfig = GibbsConfig(),
) -> TensorGPParams:
    """One full Gibbs sweep: draw w, then each U^(k) in turn."""
    D, n, r, Q = model.D, model.n, model.r, model.Q
    I = model.I  # (Q, D)
    sigma_w = config.sigma_w if config.sigma_w is not None else math.sqrt(r**D / Q)
    sigma_u = config.sigma_u if config.sigma_u is not None else math.sqrt(1.0 / r)
    sv = model.signal_var
    eye_q = jnp.eye(Q, dtype=phi.dtype)
    eye_nr = jnp.eye(n * r, dtype=phi.dtype)

    key_w, key_u = jax.random.split(key)
    U = params.U.astype(phi.dtype)  # draws inherit the feature dtype

    def factors(U):
        """temp (N, D, r) and gathered per-dim inner products g (N, D, Q)."""
        temp = phidot(phi, U)
        idx = jnp.broadcast_to(I.T.astype(jnp.int32), temp.shape[:-1] + (Q,))
        g = jnp.take_along_axis(temp, idx, axis=-1)  # (N, D, Q)
        return temp, g

    # --- draw w | U -------------------------------------------------------
    _, g = factors(U)
    V = jnp.prod(g, axis=1)  # (N, Q)
    prec_w = V.T @ V / sv + eye_q / sigma_w**2
    w = _mvn_from_precision(key_w, prec_w, V.T @ y / sv)

    # --- draw U^(k) | w, U^(-k) for each k in turn ------------------------
    def draw_factor(U, k, kk):
        _, g = factors(U)  # recomputed so later k's see earlier draws
        # zero-safe leave-one-dim-out product (prefix/suffix, no division)
        Vk = leave_one_out_products(g, axis=1)[:, k, :]  # (N, Q)
        # C[l, i] = Σ_{q: I[q,k] = l} w_q · Vk[i, q]  — segment-sum over q
        seg = I[:, k].astype(jnp.int32)  # (Q,)
        C = jax.ops.segment_sum((w[None, :] * Vk).T, seg, num_segments=r)  # (r, N)
        # Ψ[(l·n+j), i] = C[l, i]·φ[i, k, j] → (r, n, N)
        Psi = C[:, None, :] * phi[:, k, :].T[None, :, :]
        Psi = Psi.reshape(n * r, -1)
        prec = Psi @ Psi.T / sv + eye_nr / sigma_u**2
        prec = prec + config.jitter * eye_nr
        vecU = _mvn_from_precision(kk, prec, Psi @ y / sv)
        # vec index (l·n + j) ⇒ reshape (r, n) then transpose to (n, r)
        return U.at[k].set(vecU.reshape(r, n).T)

    keys = jax.random.split(key_u, D)
    for k in range(D):
        U = draw_factor(U, k, keys[k])

    return TensorGPParams(w=w, U=U)


def gibbs_sweep_columnwise(
    model: TensorGP,
    params: TensorGPParams,
    key: jax.Array,
    phi: jnp.ndarray,
    y: jnp.ndarray,
    config: GibbsConfig = GibbsConfig(),
) -> TensorGPParams:
    """Column-wise Gibbs sweep — the ``inf.R::GPT_infcol`` variant.

    Instead of one nr×nr draw per factor, each factor *column* is drawn from
    an n×n system conditioned on the others (``inf.R:94-161``): writing
    ``f(x) = a_l(x)·⟨φ^(k)(x), u_l⟩ + rest(x)`` with
    ``a_l(x) = Σ_{q: I[q,k]=l} w_q Π_{d≠k} ⟨φ^(d)(x), U^(d)_{·,I[q,d]}⟩``,
    the conditional of ``u_l`` is Bayesian linear regression with features
    ``a_l(x_i)·φ^(k)(x_i)`` and residual targets. O(D·r·n³) instead of
    O(D·(nr)³) — the right block size when nr is large (kin40k: nr = 3000).
    """
    D, n, r, Q = model.D, model.n, model.r, model.Q
    I = model.I
    sigma_w = config.sigma_w if config.sigma_w is not None else math.sqrt(r**D / Q)
    sigma_u = config.sigma_u if config.sigma_u is not None else math.sqrt(1.0 / r)
    sv = model.signal_var
    eye_q = jnp.eye(Q, dtype=phi.dtype)
    eye_n = jnp.eye(n, dtype=phi.dtype)

    key_w, key_u = jax.random.split(key)
    It = I.T.astype(jnp.int32)  # (D, Q)

    def gather_g(temp):
        """g[i, d, q] = temp[i, d, I[q, d]] — (N, D, Q), a pure gather."""
        idx = jnp.broadcast_to(It, temp.shape[:-1] + (Q,))
        return jnp.take_along_axis(temp, idx, axis=-1)

    # temp (N, D, r) is THE incremental state: a column draw changes exactly
    # one temp column (one matvec), so the full phidot runs once per sweep
    # instead of once per column (the round-1 Python loop rebuilt all tables
    # D·r times — O(D²·r²) forwards/sweep at kin40k scale).
    temp = phidot(phi, params.U)

    # w | U — identical to the blocked sweep
    g = gather_g(temp)
    V = jnp.prod(g, axis=1)
    prec_w = V.T @ V / sv + eye_q / sigma_w**2
    w = _mvn_from_precision(key_w, prec_w, V.T @ y / sv)

    keys = jax.random.split(key_u, (D, r))
    dim_ids = jnp.arange(D, dtype=jnp.int32)

    def factor_block(temp, inputs):
        """Draw all r columns of factor k. The leave-k-out product ``loo``
        depends only on the OTHER dimensions' tables, so it is constant
        across the whole column scan — computed once per block."""
        k, keys_k = inputs
        g = gather_g(temp)
        loo = jnp.prod(
            jnp.where((dim_ids != k)[None, :, None], g, 1.0), axis=1
        )  # (N, Q)
        phik = jnp.take(phi, k, axis=1)  # (N, n)
        Ik = jnp.take(I, k, axis=1).astype(jnp.int32)  # (Q,)

        def draw_column(temp_k, inp):
            l, kk = inp
            in_l = (Ik == l).astype(phi.dtype)
            g_k = jnp.take(temp_k, Ik, axis=1)  # (N, Q) current dim-k values
            a_l = loo @ (w * in_l)  # (N,)
            rest = (loo * g_k) @ (w * (1.0 - in_l))  # (N,)
            feats = a_l[:, None] * phik  # (N, n)
            prec = feats.T @ feats / sv + (1.0 / sigma_u**2 + config.jitter) * eye_n
            rhs = feats.T @ (y - rest) / sv
            u_l = _mvn_from_precision(kk, prec, rhs)
            # incremental table refresh: only column l of dim k changed
            temp_k = temp_k.at[:, l].set(phik @ u_l)
            return temp_k, u_l

        temp_k0 = jnp.take(temp, k, axis=1)  # (N, r)
        temp_k, u_cols = jax.lax.scan(
            draw_column, temp_k0, (jnp.arange(r, dtype=jnp.int32), keys_k)
        )
        return temp.at[:, k, :].set(temp_k), u_cols.T  # u_cols (r, n) → (n, r)

    temp, U_new = jax.lax.scan(factor_block, temp, (dim_ids, keys))
    return TensorGPParams(w=w, U=U_new)


def run_gibbs(
    model: TensorGP,
    params0: TensorGPParams,
    key: jax.Array,
    phi: jnp.ndarray,
    y: jnp.ndarray,
    *,
    num_iterations: int,
    burnin: int,
    config: GibbsConfig = GibbsConfig(),
    collect_fn=None,
    columnwise: bool = False,
):
    """Run a Gibbs chain; returns (final_params, collected post-burnin).

    Reference harness: ``TGP.GPT_inf``/``TensorRes`` (``TGP.jl:37-108``);
    ``columnwise=True`` selects the ``GPT_infcol`` n×n-block variant.
    """
    if collect_fn is None:
        collect_fn = lambda p: p

    params0 = jax.tree.map(lambda a: a.astype(phi.dtype), params0)
    sweep = gibbs_sweep_columnwise if columnwise else gibbs_sweep

    def body(carry, k):
        params = sweep(model, carry, k, phi, y, config)
        return params, collect_fn(params)

    keys = jax.random.split(key, num_iterations)
    final, collected = jax.lax.scan(body, params0, keys)
    collected = jax.tree.map(lambda a: a[burnin:], collected)
    return final, collected


def init_gibbs_params(model: TensorGP, key: jax.Array,
                      config: GibbsConfig = GibbsConfig(), dtype=jnp.float32) -> TensorGPParams:
    """Gaussian init matching TGP.jl:51-53 (U ~ N(0, σ_u²), w drawn in sweep 1)."""
    sigma_u = config.sigma_u if config.sigma_u is not None else math.sqrt(1.0 / model.r)
    kw, ku = jax.random.split(key)
    w = jnp.zeros((model.Q,), dtype)
    U = sigma_u * jax.random.normal(ku, (model.D, model.n, model.r), dtype)
    return TensorGPParams(w=w, U=U)
