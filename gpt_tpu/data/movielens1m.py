"""MovieLens-1M loader (L5 data layer).

Capability parity with ``1m_movielensExperiment.jl`` preprocessing: the
``ml-1m`` distribution (``::``-separated ratings.dat/users.dat/movies.dat),
movie-ID remapping to a dense range (``:944``), user side info (gender, age
group one-hot, occupation one-hot) and 18-genre movie flags with multi-genre
binning (``:918-927``), random permutation train/test splits with Ntrain=800k
(``:984-996``), and train-stats rating z-scoring.

The data is NOT in the reference checkout (SURVEY.md §2.8 "missing"); this
loader raises a clear error when absent and is exercised by synthetic-format
tests.
"""
from __future__ import annotations

import os

import numpy as np

from gpt_tpu.data.loaders import MovieLensFold, REFERENCE_ROOT


def load_movielens_1m(
    root: str = REFERENCE_ROOT,
    *,
    n_train: int = 800_000,
    seed: int = 0,
) -> MovieLensFold:
    base = os.path.join(root, "ml-1m")
    ratings_path = os.path.join(base, "ratings.dat")
    if not os.path.exists(ratings_path):
        raise FileNotFoundError(
            f"{ratings_path} not found — the ml-1m distribution is not part of "
            "the reference checkout (SURVEY.md §2.8); place it under "
            f"{base} to run the 1M experiments."
        )

    def read_dat(path):
        rows = []
        with open(path, encoding="latin-1") as f:
            for line in f:
                rows.append(line.rstrip("\n").split("::"))
        return rows

    ratings = np.array(
        [[int(r[0]), int(r[1]), int(r[2])] for r in read_dat(ratings_path)],
        dtype=np.int64,
    )
    users = read_dat(os.path.join(base, "users.dat"))  # id::gender::age::occ::zip
    movies = read_dat(os.path.join(base, "movies.dat"))  # id::title::genres

    # dense movie-id remap (1m_movielensExperiment.jl:944)
    movie_ids = np.array([int(m[0]) for m in movies])
    remap = {mid: i for i, mid in enumerate(movie_ids)}
    num_users = max(int(u[0]) for u in users)
    num_movies = len(movie_ids)

    # user side info: gender + age-group one-hot + occupation one-hot
    ages = sorted({int(u[2]) for u in users})
    occs = sorted({int(u[3]) for u in users})
    user_data = np.zeros((num_users, 1 + len(ages) + len(occs)))
    for u in users:
        uid = int(u[0]) - 1
        user_data[uid, 0] = 1.0 if u[1] == "M" else 0.0
        user_data[uid, 1 + ages.index(int(u[2]))] = 1.0
        user_data[uid, 1 + len(ages) + occs.index(int(u[3]))] = 1.0

    genres = [
        "Action", "Adventure", "Animation", "Children's", "Comedy", "Crime",
        "Documentary", "Drama", "Fantasy", "Film-Noir", "Horror", "Musical",
        "Mystery", "Romance", "Sci-Fi", "Thriller", "War", "Western",
    ]
    movie_data = np.zeros((num_movies, len(genres)))
    for m in movies:
        mi = remap[int(m[0])]
        for g in m[2].split("|"):
            if g in genres:
                movie_data[mi, genres.index(g)] = 1.0

    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(ratings))
    tr_idx, te_idx = perm[:n_train], perm[n_train:]
    tr, te = ratings[tr_idx], ratings[te_idx]
    mean = float(tr[:, 2].mean())
    std = float(tr[:, 2].std(ddof=1))

    def z(arr):
        out = np.zeros((len(arr), 3))
        out[:, 0] = arr[:, 0] - 1
        out[:, 1] = [remap[m] for m in arr[:, 1]]
        out[:, 2] = (arr[:, 2] - mean) / std
        return out

    return MovieLensFold(
        train=z(tr), test=z(te), user_data=user_data, movie_data=movie_data,
        rating_mean=mean, rating_std=std,
        num_users=num_users, num_movies=num_movies,
    )
