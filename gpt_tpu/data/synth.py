"""Synthetic-data generation from the tensor-GP prior.

Capability of ``MakeSynthData.jl:6-27``: draw ground-truth (w, U, I) from the
prior, evaluate f on random inputs, add Gaussian noise at several levels —
the posterior-recovery fixture for sampler correctness tests (SURVEY.md §4.4).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.models import TensorGP, TensorGPParams, sample_core_indices


class TensorSynthData(NamedTuple):
    X: jnp.ndarray
    phi: jnp.ndarray
    f: jnp.ndarray
    y: dict  # noise sd -> labels
    params: TensorGPParams
    I: jnp.ndarray
    model: TensorGP


def make_tensor_synth(
    key: jax.Array,
    *,
    N: int = 100,
    D: int = 5,
    n: int = 5,
    r: int = 2,
    Q: int = 32,
    length_scale: float = 1.0,
    sigma_RBF: float = 1.0,
    noise_sds=(0.1, 0.01, 0.001),
    signal_var: float = 0.01,
) -> TensorSynthData:
    kI, kp, kx, kf, kn = jax.random.split(key, 5)
    I = sample_core_indices(kI, r, D, Q)
    model = TensorGP(n=n, r=r, D=D, I=I, signal_var=signal_var)
    params = model.init_params(kp)
    X = jax.random.normal(kx, (N, D))
    rff = sample_tensor_rff(kf, n, D)
    phi = tensor_features(X, rff, length_scale, sigma_RBF, tensor_phi_scale(n, Q, D))
    f = model.predict(params, phi)
    noise = jax.random.normal(kn, (N,))
    y = {sd: f + sd * noise for sd in noise_sds}
    return TensorSynthData(X=X, phi=phi, f=f, y=y, params=params, I=I, model=model)


def make_synthetic_ml1m(
    seed: int = 0,
    *,
    num_users: int = 6040,
    num_movies: int = 3883,
    num_ratings: int = 1_000_209,
    r: int = 15,
    n_train: int = 800_000,
    split_seed: int | None = None,
):
    """ML-1M-shaped synthetic CF dataset for the 800k-rating scale path.

    The real ``ml-1m`` distribution is absent from the reference checkout
    (SURVEY.md §2.8), so this generates a dataset with its exact shape
    (``1m_movielensExperiment.jl:984-996``): 6040 users × 3883 movies ×
    ~1M ratings, power-law user/movie activity, ratings 1-5 drawn from a
    ground-truth rank-r bilinear model + noise, plus side-info matrices in
    the loader's layout. Returns a :class:`MovieLensFold`.
    """
    import numpy as np

    from gpt_tpu.data.loaders import MovieLensFold

    rng = np.random.default_rng(seed)
    # power-law activity (heavy users/popular movies, like the real data)
    pu = rng.pareto(1.2, num_users) + 1.0
    pm = rng.pareto(1.1, num_movies) + 1.0
    uid = rng.choice(num_users, size=num_ratings, p=pu / pu.sum())
    mid = rng.choice(num_movies, size=num_ratings, p=pm / pm.sum())

    U = rng.normal(0, 1 / np.sqrt(r), (num_users, r))
    V = rng.normal(0, 1 / np.sqrt(r), (num_movies, r))
    w = np.diag(rng.normal(0, 1.0, r))
    score = np.einsum("ir,rr,ir->i", U[uid], w, V[mid])
    raw = 3.6 + 1.1 * score + 0.9 * rng.normal(size=num_ratings)
    stars = np.clip(np.rint(raw), 1, 5)

    ratings = np.stack([uid, mid, stars], axis=1).astype(np.float64)
    # split_seed varies the train/test permutation over a FIXED dataset —
    # the reference's 5-random-permutation-splits protocol
    # (1m_movielensExperiment.jl:984-996)
    split_rng = rng if split_seed is None else np.random.default_rng(split_seed)
    perm = split_rng.permutation(num_ratings)
    tr, te = ratings[perm[:n_train]], ratings[perm[n_train:]]
    mean, std = float(tr[:, 2].mean()), float(tr[:, 2].std(ddof=1))

    def z(arr):
        out = arr.copy()
        out[:, 2] = (arr[:, 2] - mean) / std
        return out

    user_data = (rng.random((num_users, 30)) < 0.1).astype(np.float64)
    movie_data = (rng.random((num_movies, 18)) < 0.15).astype(np.float64)
    return MovieLensFold(
        train=z(tr), test=z(te), user_data=user_data, movie_data=movie_data,
        rating_mean=mean, rating_std=std,
        num_users=num_users, num_movies=num_movies,
    )
