"""BPMF-style conjugate Gibbs for the CF bilinear model (L3).

Capability parity with ``GPT_fixw_gibbs`` / ``GPT_fullw_gibbs``
(``100k_movielensExperiment.jl:944-1129``): alternate exact Gaussian draws of

- each user row ``U[i,:]`` from the r×r system built from that user's rated
  movies (``Σᵢ = (V_{Nᵢ} wᵀ)ᵀ(V_{Nᵢ} wᵀ)/σ² + I/σ_u²``),
- each movie row ``V[j,:]`` symmetrically,
- (full-w variant) the core ``vec(w)`` from the r²×r² system with per-rating
  features ``vec(outer(U_user, V_movie))``,

plus the optional random rotation of (w, U) at init (``:957-962``) —
:func:`rotated_w_init`.

TPU-native: the reference's per-user Python loop with boolean masks becomes
one ``segment_sum`` of per-rating outer products into ``(n_users, r, r)``
precision stacks, then one *batched* Cholesky + triangular solve — every user
and movie is drawn simultaneously on the MXU. Entities with no ratings get an
exact prior draw (the reference skips them, keeping the stale value — a
superseded behaviour, not reproduced).

Note: plain (b = c = 0) model only — the conjugate structure breaks with
side-info row-sums, which is why the reference only has Gibbs for the plain
model.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gpt_tpu.models.cf import CFBatch, CFModel, CFParams


@dataclasses.dataclass(frozen=True)
class CFGibbsConfig:
    n_samples: int = 1  # Gibbs sweeps per epoch (reference n_samples)
    jitter: float = 1e-6


def rotated_w_init(key: jax.Array, params: CFParams) -> CFParams:
    """Random orthogonal re-parameterisation of the core at init.

    The reference's ``rotated_w`` flag (``100k_movielensExperiment.jl:957-962``):
    draw ``Q`` from the QR of an r×r Gaussian, then ``w ← Q w`` and
    ``U ← U Qᵀ``. Per-rating predictions ``U[i,:] w V[j,:]ᵀ`` are invariant
    (``U Qᵀ Q w = U w``); the rotation only randomises the *fixed-w* Gibbs
    chain's coordinate frame so that a hand-picked diagonal ``w`` (e.g. the
    BPMF-informed init, ``:782-795``) does not privilege axis-aligned factors.
    """
    r = params.w.shape[-1]
    Qm, _ = jnp.linalg.qr(jax.random.normal(key, (r, r), params.w.dtype))
    return params._replace(w=Qm @ params.w, U=params.U @ Qm.T)


def _batched_row_draw(key, feats, seg_ids, y, num_entities, sv, sigma_u, jitter):
    """Draw every entity row simultaneously.

    ``feats (N, r)`` is the per-rating regressor for the entity being updated
    (e.g. ``V[movie] @ w.T`` for user updates); row i of the result solves the
    ridge system over ratings with ``seg_ids == i``.
    """
    r = feats.shape[1]
    outer = feats[:, :, None] * feats[:, None, :]  # (N, r, r)
    prec = jax.ops.segment_sum(outer, seg_ids, num_segments=num_entities) / sv
    prec = prec + (1.0 / sigma_u**2 + jitter) * jnp.eye(r, dtype=feats.dtype)
    rhs = jax.ops.segment_sum(feats * y[:, None], seg_ids, num_segments=num_entities) / sv
    L = jnp.linalg.cholesky(prec)  # batched (E, r, r)
    mu = jax.scipy.linalg.cho_solve((L, True), rhs[:, :, None])[:, :, 0]
    xi = jax.random.normal(key, (num_entities, r), feats.dtype)
    noise = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), xi[:, :, None], lower=False
    )[:, :, 0]
    return mu + noise


def cf_gibbs_sweep(
    model: CFModel,
    params: CFParams,
    key: jax.Array,
    batch: CFBatch,
    y: jnp.ndarray,
    config: CFGibbsConfig = CFGibbsConfig(),
    *,
    sample_w: bool = True,
) -> CFParams:
    """One Gibbs sweep over (U, V[, w]) given ALL ratings."""
    if model.b != 0.0 or model.c != 0.0 or model.D1 or model.D2 or model.stiefel:
        raise ValueError(
            "cf_gibbs supports the plain bilinear model only (b=c=0, no "
            "side-info rows, Gaussian factors) — the conjugate structure "
            "breaks otherwise; the reference likewise has Gibbs only for "
            "the plain model (100k_movielensExperiment.jl:944-1129). Use "
            "run_sgld / run_cf_sgld_thresh for side-info configs."
        )
    sv = model.signal_var
    a = model.a  # pred = a·(U_u w V_mᵀ) → a folds into every regressor
    ku, kv, kw = jax.random.split(key, 3)
    U, V, w = params.U, params.V, params.w

    # U | V, w  — regressor per rating: a·(V[movie] wᵀ)
    featsU = a * (V[batch.movies] @ w.T)  # (N, r)
    U = _batched_row_draw(ku, featsU, batch.users, y, model.n1, sv,
                          model.sigma_u, config.jitter)

    # V | U, w
    featsV = a * (U[batch.users] @ w)  # (N, r)
    V = _batched_row_draw(kv, featsV, batch.movies, y, model.n2, sv,
                          model.sigma_u, config.jitter)

    if sample_w and not model.fix_w:
        # w | U, V — per-rating feature a·vec(outer(U_u, V_m)) (row-major
        # s,t matching pred = a·Σ_st U_u[s] w[s,t] V_m[t]).
        Uu, Vm = U[batch.users], V[batch.movies]
        Kron = a * (Uu[:, :, None] * Vm[:, None, :]).reshape(y.shape[0], -1)  # (N, r²)
        r2 = Kron.shape[1]
        prec = Kron.T @ Kron / sv + (1.0 / model.sigma_w**2 + config.jitter) * jnp.eye(
            r2, dtype=Kron.dtype
        )
        rhs = Kron.T @ y / sv
        L = jnp.linalg.cholesky(prec)
        mu = jax.scipy.linalg.cho_solve((L, True), rhs)
        xi = jax.random.normal(kw, (r2,), Kron.dtype)
        wvec = mu + jax.scipy.linalg.solve_triangular(L, xi, trans="T", lower=True)
        w = wvec.reshape(params.w.shape)

    return CFParams(U=U, V=V, w=w)


def run_cf_gibbs(
    model: CFModel,
    params0: CFParams,
    key: jax.Array,
    ratings: jnp.ndarray,  # (N, 3) [user, movie, rating_z]
    *,
    burnin: int,
    maxepoch: int,
    config: CFGibbsConfig = CFGibbsConfig(),
    collect_fn=None,
):
    """Run the BPMF-style Gibbs chain; collects post-burnin epoch states."""
    if collect_fn is None:
        collect_fn = lambda p: p
    batch = CFBatch(
        users=ratings[:, 0].astype(jnp.int32),
        movies=ratings[:, 1].astype(jnp.int32),
    )
    y = ratings[:, 2].astype(params0.w.dtype)

    def epoch(params, k):
        def sweep(p, kk):
            return cf_gibbs_sweep(model, p, kk, batch, y, config), None

        params, _ = jax.lax.scan(sweep, params, jax.random.split(k, config.n_samples))
        return params, collect_fn(params)

    final, collected = jax.lax.scan(epoch, params0, jax.random.split(key, burnin + maxepoch))
    collected = jax.tree.map(lambda a: a[burnin:], collected)
    return final, collected
