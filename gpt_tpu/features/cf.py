"""Collaborative-filtering hashing features (L1).

Capability parity with the reference's CF feature family
(``GPT_SGLD.jl:1238-1295``): each user/movie gets a sparse ±1 hashing-trick
embedding of length n (M nonzeros, scaled) concatenated with its scaled
side-information row; a rating's full-theta feature is the Kronecker product
of its user and movie embeddings.

TPU-first representation: the hashed part is materialised as a dense
``(num_entities, n)`` matrix built with one ``scatter`` (entity tables are
small: 943 users / 1682 movies for ML-100k), and per-rating features are
``gather`` + batched outer products — no Python loops, no sparse formats.
The scale gradients of ``CFgradfeatureNotensor`` (``GPT_SGLD.jl:1275-1294``)
come for free from autodiff since ``cf_features`` is differentiable in
``(a, b1, b2)``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CFHashing(NamedTuple):
    """Hashing-trick sample for one entity family (users or movies).

    ``positions[j, e]`` — M distinct hash positions in [0, n) per entity e;
    ``signs[j, e]`` — Rademacher ±1 signs. Reference convention:
    ``GPT_SGLD.jl:1238-1239`` (``sample(1:n, M, replace=false)`` per column,
    Bernoulli signs).
    """

    positions: jnp.ndarray  # (M, num_entities) int32
    signs: jnp.ndarray  # (M, num_entities) float
    n: int


def sample_cf_hashing(key: jax.Array, n: int, M: int, num_entities: int,
                      dtype=jnp.float32) -> CFHashing:
    kp, ks = jax.random.split(key)
    # Distinct positions per entity: take the first M of a random permutation.
    perm = jax.vmap(lambda k: jax.random.permutation(k, n)[:M])(
        jax.random.split(kp, num_entities)
    )  # (num_entities, M)
    signs = 2.0 * jax.random.bernoulli(ks, 0.5, (M, num_entities)).astype(dtype) - 1.0
    return CFHashing(positions=perm.T.astype(jnp.int32), signs=signs, n=n)


def _hash_table(h: CFHashing, scale, dtype) -> jnp.ndarray:
    """Dense (num_entities, n) table of the hashed embeddings."""
    M, E = h.positions.shape
    table = jnp.zeros((E, h.n), dtype=dtype)
    entity_idx = jnp.broadcast_to(jnp.arange(E)[None, :], (M, E))
    table = table.at[entity_idx.ravel(), h.positions.ravel()].set(
        h.signs.ravel().astype(dtype)
    )
    return scale * table


def cf_features(
    user_data: jnp.ndarray,  # (Nu, Du) side info
    movie_data: jnp.ndarray,  # (Nm, Dm) side info
    user_hash: CFHashing,
    movie_hash: CFHashing,
    a,
    b1,
    b2,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-entity embedding tables ``(Nu, n+Du)`` and ``(Nm, n+Dm)``.

    User hashed block is scaled ``a/sqrt(M)``, movie hashed block
    ``1/sqrt(M)``; side-info blocks scaled ``b1`` / ``b2``
    (reference: ``CFfeature``, ``GPT_SGLD.jl:1240-1260``).
    """
    dtype = user_data.dtype
    M = user_hash.positions.shape[0]
    a = jnp.asarray(a, dtype)
    phi_user = jnp.concatenate(
        [_hash_table(user_hash, a / jnp.sqrt(float(M)), dtype),
         jnp.asarray(b1, dtype) * user_data],
        axis=1,
    )
    phi_movie = jnp.concatenate(
        [_hash_table(movie_hash, 1.0 / jnp.sqrt(float(M)), dtype),
         jnp.asarray(b2, dtype) * movie_data],
        axis=1,
    )
    return phi_user, phi_movie


def cf_features_full(
    ratings: jnp.ndarray,  # (N, 2) int [user, movie] indices (0-based)
    phi_user: jnp.ndarray,  # (Nu, n+Du)
    phi_movie: jnp.ndarray,  # (Nm, n+Dm)
) -> jnp.ndarray:
    """Per-rating full-theta feature = outer(user emb, movie emb), flattened.

    Reference: ``CFfeatureNotensor`` (``GPT_SGLD.jl:1263-1274``) computes
    ``kron(phiUser[:,u], phiMovie[:,m])`` per rating; the flattened outer
    product here matches that layout with row-major (user-major) ordering.
    Shape: ``(N, (n+Du)·(n+Dm))``.
    """
    pu = phi_user[ratings[:, 0]]  # (N, n+Du)
    pm = phi_movie[ratings[:, 1]]  # (N, n+Dm)
    return (pu[:, :, None] * pm[:, None, :]).reshape(ratings.shape[0], -1)
