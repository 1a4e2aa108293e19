"""Rating-frequency RMSE analyses for CF experiments (L7).

Capability parity with ``freq`` / ``RMSEbyfreq`` / ``RMSEbyfreq_binned``
(``100k_movielensExperiment.jl:1131-1208``): break test RMSE down by how many
train ratings each user/movie has, to compare cold-start behaviour against a
baseline predictor (the reference compares to BayesPMF predictions from
``bayespmf_pred.h5``).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np


def entity_frequencies(train_ids: np.ndarray, num_entities: int) -> np.ndarray:
    """Train-rating count per entity id (``freq``, ``:1131-1140``)."""
    return np.bincount(np.asarray(train_ids, np.int64), minlength=num_entities)


class FreqRMSE(NamedTuple):
    freqs: np.ndarray  # distinct frequency values (or bin lower edges)
    rmse: np.ndarray  # RMSE over test ratings whose entity has that frequency
    counts: np.ndarray  # number of test ratings per group


def rmse_by_frequency(
    test_ids: np.ndarray,
    errors: np.ndarray,
    train_freq: np.ndarray,
    *,
    bins: np.ndarray | None = None,
) -> FreqRMSE:
    """Group squared test errors by the entity's train frequency.

    ``bins=None`` → one group per distinct frequency (``RMSEbyfreq``);
    otherwise frequencies are binned by the given edges
    (``RMSEbyfreq_binned``).
    """
    test_ids = np.asarray(test_ids, np.int64)
    errors = np.asarray(errors, np.float64)
    f = train_freq[test_ids]
    if bins is None:
        values = np.unique(f)
        group = np.searchsorted(values, f)
        edges = values
    else:
        edges = np.asarray(bins, np.float64)
        # frequencies below the first edge (true cold start) get their own
        # leading group instead of being clipped into bin 0
        below = f < edges[0]
        if below.any():
            edges = np.concatenate([[f[below].min()], edges])
        group = np.clip(np.digitize(f, edges) - 1, 0, len(edges) - 1)
        values = edges
    k = len(values)
    sq = np.bincount(group, weights=errors**2, minlength=k)
    cnt = np.bincount(group, minlength=k)
    with np.errstate(invalid="ignore", divide="ignore"):
        rmse = np.sqrt(sq / np.maximum(cnt, 1))
    rmse[cnt == 0] = np.nan
    return FreqRMSE(freqs=values, rmse=rmse, counts=cnt)


def load_bayespmf_predictions(path: str = "/root/reference/bayespmf_pred.h5") -> np.ndarray:
    """The reference's BayesPMF comparison predictions, consumed at
    ``100k_movielensExperiment.jl:1190-1195``.

    Row alignment (recovered in round 2): the 20000 predictions correspond to
    the *file-order* tail of ``ml-100k/u.data`` — rows 80001..100000 as the
    reference reads them (``Rating = readdlm("ml-100k/u.data")``;
    ``Ratingtest = Rating[Ntrain+1:Ntrain+Ntest,:]``), NOT to ``u1.test``
    (corr 0.592 / RMSE 0.902 against the u.data tail vs corr 0.004 against
    u1.test). Use ``load_movielens_100k(fold="file")`` for the matching split.
    """
    import h5py

    with h5py.File(path, "r") as h:
        return np.array(h["bayespmf_pred"]).ravel()


def bayespmf_head_to_head(
    fold,
    our_pred: np.ndarray,
    *,
    nbins: int = 100,
    path: str = "/root/reference/bayespmf_pred.h5",
):
    """The reference's RMSE-by-frequency BayesPMF comparison
    (``100k_movielensExperiment.jl:1188-1208``): binned per-user-frequency and
    per-movie-frequency test RMSE curves for our predictions and BayesPMF's,
    on the file-order u.data split.

    ``fold`` must be ``load_movielens_100k(fold="file")``; ``our_pred`` is our
    de-normalised (N_test,) prediction vector on ``fold.test``. Returns a dict
    of FreqRMSE curves keyed ``{user,movie}_{ours,bpmf}`` plus overall RMSEs.
    """
    bpmf = load_bayespmf_predictions(path)
    y_raw = fold.test[:, 2] * fold.rating_std + fold.rating_mean
    users = fold.test[:, 0].astype(np.int64)
    movies = fold.test[:, 1].astype(np.int64)
    userfreq = entity_frequencies(fold.train[:, 0], fold.num_users)
    moviefreq = entity_frequencies(fold.train[:, 1], fold.num_movies)
    # quantile bin edges over test-rating frequencies, as the reference's
    # nbins-quantile binning (100k_movielensExperiment.jl:1160-1178)
    qu = np.unique(np.quantile(userfreq[users], np.linspace(0, 1, nbins + 1)[:-1]))
    qm = np.unique(np.quantile(moviefreq[movies], np.linspace(0, 1, nbins + 1)[:-1]))
    err_ours = y_raw - np.asarray(our_pred, np.float64)
    err_bpmf = y_raw - bpmf
    out = {
        "user_ours": rmse_by_frequency(users, err_ours, userfreq, bins=qu),
        "user_bpmf": rmse_by_frequency(users, err_bpmf, userfreq, bins=qu),
        "movie_ours": rmse_by_frequency(movies, err_ours, moviefreq, bins=qm),
        "movie_bpmf": rmse_by_frequency(movies, err_bpmf, moviefreq, bins=qm),
        "rmse_ours": float(np.sqrt(np.mean(err_ours**2))),
        "rmse_bpmf": float(np.sqrt(np.mean(err_bpmf**2))),
    }
    return out
