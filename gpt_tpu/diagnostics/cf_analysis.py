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
    """The reference's BayesPMF comparison predictions (20000 test ratings of
    fold u1; consumed at ``100k_movielensExperiment.jl:1190-1195``)."""
    import h5py

    with h5py.File(path, "r") as h:
        return np.array(h["bayespmf_pred"]).ravel()
