"""Sparse-noise SGLD for the CF model — the "thresh" variant (L3).

Capability parity with ``GPT_fixw_sideinfo_thresh``
(``100k_movielensExperiment.jl:800-942``): per minibatch, Langevin noise is
injected ONLY on the U/V rows touched by the batch (the rated users/movies and
their side-info rows); untouched rows get a pure (half-)gradient prior step.
This matches the sparse-gradient structure so noise doesn't swamp rarely-rated
entities.

The reference computes per-entity minibatch-inclusion probabilities "for bias
correction" (``:824-832``) but never uses them — dead code in both the 100k
and 1M scripts. The *intended* correction (scale a touched row's noise by
``1/√p_incl`` so the time-averaged injected noise matches dense SGLD) is
implemented here behind ``bias_correction=True``; default False for parity.

TPU-native: touched-row masks come from the batch one-hots (a segment max),
noise is a masked dense normal — no dynamic shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gpt_tpu.models.cf import CFBatch, CFModel, CFParams


def inclusion_probabilities(freq: np.ndarray, N: int, m: int) -> np.ndarray:
    """P(entity with ``freq`` ratings appears in a size-m minibatch drawn
    without replacement from N) — ``1 − Π_{i=1..m}(1 − f/(N−i+1))``
    (reference: ``100k_movielensExperiment.jl:824-831``)."""
    i = np.arange(1, m + 1)[None, :]
    terms = 1.0 - freq[:, None] / (N - i + 1)
    return 1.0 - np.exp(np.sum(np.log(np.maximum(terms, 1e-12)), axis=1))


def _touched_mask(ids, n, side, dtype):
    """(n + D,) 0/1 mask of rows referenced by this batch's entities."""
    onehot = (ids[:, None] == jnp.arange(n)[None, :]).astype(dtype)
    hit = jnp.max(onehot, axis=0)
    if side is None:
        return hit
    feat_hit = jnp.max(side[ids].astype(dtype), axis=0)
    return jnp.concatenate([hit, jnp.minimum(feat_hit, 1.0)])


def make_thresh_step(
    model: CFModel,
    data_size: int,
    epsU: float,
    *,
    bias_correction: bool = False,
    user_inclusion: jnp.ndarray | None = None,  # (n1+D1,) P(row touched)
    movie_inclusion: jnp.ndarray | None = None,
):
    """Build ``step(params, key, batch, y) -> params`` (w frozen, per the
    reference: thresh exists only for ``fixw``)."""

    def step(params: CFParams, key, batch: CFBatch, y):
        def logp(p):
            return (data_size / y.shape[0]) * model.log_lik(p, batch, y) + model.log_prior(p)

        g = jax.grad(logp)(params)
        kU, kV = jax.random.split(key)
        dtype = params.w.dtype
        maskU = _touched_mask(batch.users, model.n1, model.user_data, dtype)
        maskV = _touched_mask(batch.movies, model.n2, model.movie_data, dtype)
        if bias_correction:
            if user_inclusion is None or movie_inclusion is None:
                raise ValueError("bias_correction requires inclusion probabilities")
            maskU = maskU / jnp.sqrt(jnp.maximum(user_inclusion, 1e-6))
            maskV = maskV / jnp.sqrt(jnp.maximum(movie_inclusion, 1e-6))
        noiseU = jnp.sqrt(epsU) * maskU[:, None] * jax.random.normal(kU, params.U.shape, dtype)
        noiseV = jnp.sqrt(epsU) * maskV[:, None] * jax.random.normal(kV, params.V.shape, dtype)
        U = params.U + epsU * g.U / 2 + noiseU
        V = params.V + epsU * g.V / 2 + noiseV
        return CFParams(U=U, V=V, w=params.w)

    return step


def run_cf_sgld_thresh(
    model: CFModel,
    params0: CFParams,
    key: jax.Array,
    ratings: jnp.ndarray,  # (N, 3)
    *,
    m: int,
    epsU: float,
    burnin: int,
    maxepoch: int,
    bias_correction: bool = False,
    collect_fn=None,
):
    """Full thresh-SGLD run (fixed w), one jitted scan over epochs/batches."""
    if collect_fn is None:
        collect_fn = lambda p: p
    N = ratings.shape[0]
    B = -(-N // m)
    pad = B * m - N
    users = ratings[:, 0].astype(jnp.int32)
    movies = ratings[:, 1].astype(jnp.int32)
    y = ratings[:, 2].astype(params0.w.dtype)
    users_p = jnp.concatenate([users, jnp.zeros((pad,), jnp.int32)])
    movies_p = jnp.concatenate([movies, jnp.zeros((pad,), jnp.int32)])
    y_p = jnp.concatenate([y, jnp.zeros((pad,), y.dtype)])

    incl_u = incl_v = None
    if bias_correction:
        uf = np.bincount(np.asarray(users), minlength=model.n1).astype(np.float64)
        mf = np.bincount(np.asarray(movies), minlength=model.n2).astype(np.float64)
        incl_u = jnp.asarray(
            np.concatenate([
                inclusion_probabilities(uf, N, m),
                np.ones(model.D1),  # side-info rows: touched ~every batch
            ]), y.dtype)
        incl_v = jnp.asarray(
            np.concatenate([inclusion_probabilities(mf, N, m), np.ones(model.D2)]),
            y.dtype)

    step = make_thresh_step(
        model, N, epsU,
        bias_correction=bias_correction,
        user_inclusion=incl_u, movie_inclusion=incl_v,
    )

    def epoch_body(carry, _):
        params, k = carry
        k, kperm = jax.random.split(k)
        perm = jax.random.permutation(kperm, N)
        idx = jnp.concatenate([perm, jnp.full((pad,), N - 1, perm.dtype)]).reshape(B, m)

        def batch_body(c, b):
            p, kk = c
            kk, ks = jax.random.split(kk)
            bidx = idx[b]
            batch = CFBatch(users=users_p[bidx], movies=movies_p[bidx])
            return (step(p, ks, batch, y_p[bidx]), kk), None

        (params, k), _ = jax.lax.scan(batch_body, (params, k), jnp.arange(B))
        return (params, k), collect_fn(params)

    (final, _), collected = jax.lax.scan(
        epoch_body, (params0, key), None, length=burnin + maxepoch
    )
    collected = jax.tree.map(lambda a: a[burnin:], collected)
    return final, collected
