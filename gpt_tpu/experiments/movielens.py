"""MovieLens CF experiment runner (L5).

Re-expresses the reference's ML-100k harness
(``100k_movielensExperiment.jl:556-795``): per-fold z-scored ratings, SGLD/SGD
on the bilinear side-info model, per-epoch streamed train/test predictions
with running-average (``avg``) mode, de-normalisation + [1,5] cutoff, and the
reference's early-stopping *metric* (min test RMSE and its epoch; the scan is
fixed-length — SURVEY.md §7.1 — so "stop after 5 rises" becomes "report the
argmin", which is what the reference ultimately prints).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gpt_tpu.data.loaders import MovieLensFold
from gpt_tpu.experiments.configs import MovieLensPreset
from gpt_tpu.inference import SGLDConfig, run_sgld
from gpt_tpu.models.cf import CFModel, CFParams, denormalize_and_cutoff, ratings_batch


class MovieLensRun(NamedTuple):
    test_rmse: np.ndarray  # (maxepoch,) instantaneous-sample test RMSE
    avg_test_rmse: np.ndarray  # (maxepoch,) running-average-prediction RMSE
    best_rmse: float  # min over epochs of avg_test_rmse (the printed metric)
    best_epoch: int
    final_params: CFParams
    rejected: int
    best_pred: np.ndarray  # (Ntest,) de-normalised+cutoff prediction at the
    # best epoch — the reference's ``testpred_store[:,indmin(testRMSEvec)]``
    # (``100k_movielensExperiment.jl:1188-1189``), fed to the BayesPMF
    # head-to-head


def build_cf_model(fold: MovieLensFold, preset: MovieLensPreset,
                   *, side_info: bool = True, fix_w: bool = False,
                   stiefel: bool = False) -> CFModel:
    return CFModel(
        n1=fold.num_users,
        n2=fold.num_movies,
        r=preset.r,
        signal_var=preset.signal_var,
        sigma_u=preset.sigma_u,
        sigma_w=preset.sigma_w,
        a=preset.a if side_info else 1.0,
        b=preset.b if side_info else 0.0,
        c=preset.c if side_info else 0.0,
        user_data=jnp.asarray(fold.user_data, jnp.float32) if side_info else None,
        movie_data=jnp.asarray(fold.movie_data, jnp.float32) if side_info else None,
        fix_w=fix_w,
        stiefel=stiefel,
    )


def run_movielens(
    fold: MovieLensFold,
    preset: MovieLensPreset,
    key: jax.Array,
    *,
    side_info: bool = True,
    fix_w: bool = False,
    stiefel: bool = False,
    langevin: bool = True,
    w_init: jnp.ndarray | None = None,
    maxepoch: int | None = None,
) -> MovieLensRun:
    model = build_cf_model(fold, preset, side_info=side_info, fix_w=fix_w, stiefel=stiefel)
    kp, ks = jax.random.split(key)
    params0 = model.init_params(kp, w_init=w_init)

    train_batch, y_train = ratings_batch(jnp.asarray(fold.train, jnp.float32))
    test_batch, y_test = ratings_batch(jnp.asarray(fold.test, jnp.float32))

    config = SGLDConfig(
        eps=CFParams(U=preset.epsU, V=preset.epsU, w=preset.epsw),
        langevin=langevin,
    )
    E = maxepoch if maxepoch is not None else preset.maxepoch

    collect = lambda p: model.predict(p, test_batch)
    final, fhat_test = run_sgld(
        model, params0, ks, train_batch, y_train,
        m=preset.m, config=config, burnin=preset.burnin, maxepoch=E,
        collect_fn=collect,
    )

    # de-normalised instantaneous and running-average prediction RMSEs
    y_raw = np.asarray(y_test) * fold.rating_std + fold.rating_mean
    fhat = np.asarray(fhat_test)  # (E, Ntest), z-scored
    inst = np.asarray(denormalize_and_cutoff(jnp.asarray(fhat), fold.rating_mean, fold.rating_std))
    test_rmse = np.sqrt(np.mean((inst - y_raw) ** 2, axis=1))
    running = np.cumsum(fhat, axis=0) / np.arange(1, E + 1)[:, None]
    run_cut = np.asarray(denormalize_and_cutoff(jnp.asarray(running), fold.rating_mean, fold.rating_std))
    avg_test_rmse = np.sqrt(np.mean((run_cut - y_raw) ** 2, axis=1))
    best = int(np.argmin(avg_test_rmse))
    return MovieLensRun(
        test_rmse=test_rmse,
        avg_test_rmse=avg_test_rmse,
        best_rmse=float(avg_test_rmse[best]),
        best_epoch=best,
        final_params=final.params,
        rejected=int(np.asarray(final.rejected)),
        best_pred=run_cut[best],
    )
