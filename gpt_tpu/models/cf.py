"""MovieLens collaborative-filtering models (L2).

Capability parity with the reference's in-script CF model family
(``100k_movielensExperiment.jl:56-551``, duplicated in
``1m_movielensExperiment.jl``):

- plain bilinear model  ``pred = (U[user,:] w) · V[movie,:]``  (``GPT_fixw`` /
  ``GPT_fullw``);
- side-information model ``pred = a · (sumU w) · sumV`` with
  ``sumU = U[user,:] + b·Σ_{f∈feats(user)} U[n1+f,:]`` (``GPT_fixw_sideinfo``
  / ``GPT_fullw_sideinfo``, the headline ML-100k config at ``:729-739``);
- fixed-core (w frozen) vs full-w variants via the ``fix_w`` flag → the
  manifold tag "frozen" that samplers skip;
- Gaussian vs Stiefel factor priors (``stiefel`` flag).

TPU-first design: the reference's per-rating scalar scatter loop
(``100k_movielensExperiment.jl:463-475``) becomes a dense *selection matrix*
product — ``S_u (m, n1+D1)`` holds a one-hot row per rating plus ``b``-scaled
side-info indicator entries, so batch embeddings are ``S_u @ U`` and the
gradient transpose ``S_uᵀ @ (…)`` is also a matmul (no TPU scatter in the hot
path; the same trick that makes the Tucker contraction fast).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpt_tpu.utils import stiefel as _stiefel


class CFParams(NamedTuple):
    U: jnp.ndarray  # (..., n1+D1, r)
    V: jnp.ndarray  # (..., n2+D2, r)
    w: jnp.ndarray  # (..., r, r)


class CFBatch(NamedTuple):
    """A batch of ratings: integer user/movie ids + z-scored rating."""

    users: jnp.ndarray  # (m,) int32
    movies: jnp.ndarray  # (m,) int32


def ratings_batch(arr: jnp.ndarray) -> tuple[CFBatch, jnp.ndarray]:
    """Split an (m, 3) [user, movie, rating] array into (batch, y)."""
    return CFBatch(
        users=arr[:, 0].astype(jnp.int32), movies=arr[:, 1].astype(jnp.int32)
    ), arr[:, 2]


@dataclass(frozen=True)
class CFModel:
    n1: int  # num users
    n2: int  # num movies
    r: int
    signal_var: float
    sigma_u: float = 0.1  # factor prior sd (100k_movielensExperiment.jl:736)
    sigma_w: float = 1.0
    a: float = 1.0  # overall scale (sideinfo models; :739)
    b: float = 0.0  # user side-info weight
    c: float = 0.0  # movie side-info weight
    user_data: jnp.ndarray | None = None  # (n1, D1) binary side info
    movie_data: jnp.ndarray | None = None  # (n2, D2)
    fix_w: bool = False  # GPT_fixw*: core frozen at its init value
    stiefel: bool = False

    @property
    def D1(self) -> int:
        return 0 if self.user_data is None else self.user_data.shape[1]

    @property
    def D2(self) -> int:
        return 0 if self.movie_data is None else self.movie_data.shape[1]

    # -- parameters ---------------------------------------------------------
    def init_params(self, key: jax.Array, w_init: jnp.ndarray | None = None,
                    dtype=jnp.float32) -> CFParams:
        """U, V ~ N(0, σ_u²) (or uniform Stiefel); w ~ N(0, σ_w²) or given.

        ``w_init`` supports the reference's BPMF-informed initialisation
        (``ml100k_UVhyperparams.h5`` consumed at
        ``100k_movielensExperiment.jl:782-795``).
        """
        ku, kv, kw = jax.random.split(key, 3)
        shape_u, shape_v = (self.n1 + self.D1, self.r), (self.n2 + self.D2, self.r)
        if self.stiefel:
            U = _stiefel.sample_stiefel(ku, *shape_u, dtype=dtype)
            V = _stiefel.sample_stiefel(kv, *shape_v, dtype=dtype)
        else:
            U = self.sigma_u * jax.random.normal(ku, shape_u, dtype)
            V = self.sigma_u * jax.random.normal(kv, shape_v, dtype)
        if w_init is None:
            w = self.sigma_w * jax.random.normal(kw, (self.r, self.r), dtype)
        else:
            w = jnp.asarray(w_init, dtype)
        return CFParams(U=U, V=V, w=w)

    @property
    def manifolds(self) -> CFParams:
        tag = "stiefel" if self.stiefel else "euclidean"
        return CFParams(U=tag, V=tag, w="frozen" if self.fix_w else "euclidean")

    @property
    def event_ndims(self) -> CFParams:
        """Trailing parameter axes per leaf (leading axes = chains)."""
        return CFParams(U=2, V=2, w=2)

    # -- embeddings ---------------------------------------------------------
    def _selection(self, ids: jnp.ndarray, n: int, side: jnp.ndarray | None,
                   weight: float, dtype) -> jnp.ndarray:
        """S (m, n + D): one-hot of the entity id + weighted side-info flags.

        ``S @ U`` = the reference's ``U[user,:] + b·sum(U[uidx,:], 1)``
        (``100k_movielensExperiment.jl:330-331``); its transpose is the
        scatter-accumulated gradient — both pure matmuls.
        """
        onehot = (ids[:, None] == jnp.arange(n)[None, :]).astype(dtype)
        if side is None:
            return onehot
        return jnp.concatenate([onehot, weight * side[ids].astype(dtype)], axis=1)

    def embeddings(self, params: CFParams, batch: CFBatch):
        dtype = params.w.dtype
        Su = self._selection(batch.users, self.n1, self.user_data, self.b, dtype)
        Sv = self._selection(batch.movies, self.n2, self.movie_data, self.c, dtype)
        sumU = jnp.einsum("mn,...nr->...mr", Su, params.U)
        sumV = jnp.einsum("mn,...nr->...mr", Sv, params.V)
        return sumU, sumV

    # -- densities ----------------------------------------------------------
    def predict(self, params: CFParams, batch: CFBatch) -> jnp.ndarray:
        """z-scored rating predictions for the batch → (..., m)."""
        sumU, sumV = self.embeddings(params, batch)
        return self.a * jnp.einsum("...mr,...rs,...ms->...m", sumU, params.w, sumV)

    def log_lik(self, params: CFParams, batch: CFBatch, y: jnp.ndarray,
                weight: jnp.ndarray | None = None) -> jnp.ndarray:
        sq = (y - self.predict(params, batch)) ** 2
        if weight is not None:
            sq = sq * weight
        return -jnp.sum(sq, axis=-1) / (2.0 * self.signal_var)

    def log_prior(self, params: CFParams) -> jnp.ndarray:
        lp = -jnp.sum(params.w**2, axis=(-2, -1)) / (2 * self.sigma_w**2)
        if not self.stiefel:
            lp = lp - (
                jnp.sum(params.U**2, axis=(-2, -1))
                + jnp.sum(params.V**2, axis=(-2, -1))
            ) / (2 * self.sigma_u**2)
        return lp


def denormalize_and_cutoff(pred_z: jnp.ndarray, mean: float, std: float,
                           lo: float = 1.0, hi: float = 5.0) -> jnp.ndarray:
    """De-normalise z-scored predictions and clip to the rating range.

    Reference: ``cutoff!`` (``100k_movielensExperiment.jl:48-52``).
    """
    return jnp.clip(pred_z * std + mean, lo, hi)
