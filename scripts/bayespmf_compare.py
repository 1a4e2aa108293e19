"""BayesPMF head-to-head: RMSE-by-frequency curves on the u.data file split.

The reference's final ML-100k analysis (``100k_movielensExperiment.jl:1188-1208``)
compares its best test predictions against BayesPMF's (``bayespmf_pred.h5``)
binned by user/movie train-rating frequency. Round 1 dropped this on a
presumed row-order mismatch with u1.test; the actual alignment (recovered in
round 2) is the *file-order* 80k/20k split of ``u.data``
(``Rating = readdlm("ml-100k/u.data"); Ratingtest = Rating[Ntrain+1:...]``),
against which the artifact correlates at 0.592 with RMSE 0.902.

Trains the headline full-w side-info model on that split, then emits the
reference's 2-panel figure (plots/bayespmf_rmse_by_freq.png) and a RECORDS
entry with overall + cold-start RMSEs for both predictors.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from gpt_tpu.data import load_movielens_100k
from gpt_tpu.diagnostics.cf_analysis import bayespmf_head_to_head
from gpt_tpu.experiments import configs as C
from gpt_tpu.experiments.movielens import run_movielens
from gpt_tpu.utils.records import append_record

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    maxepoch = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    fold = load_movielens_100k("file")
    t0 = time.time()
    run = run_movielens(fold, C.MOVIELENS_100K, jax.random.PRNGKey(17),
                        maxepoch=maxepoch)
    seconds = time.time() - t0
    hh = bayespmf_head_to_head(fold, run.best_pred)

    # second leg: the BPMF-style conjugate CF Gibbs engine on the SAME split
    # — the apples-to-apples inference comparison against BayesPMF
    # (100k_movielensExperiment.jl:944-1129's GPT_fullw_gibbs capability)
    from gpt_tpu.inference import run_cf_gibbs
    from gpt_tpu.models.cf import CFBatch, CFModel, denormalize_and_cutoff

    P = C.MOVIELENS_100K
    gmodel = CFModel(n1=fold.num_users, n2=fold.num_movies, r=P.r,
                     signal_var=P.signal_var, sigma_u=0.3)
    t1 = time.time()
    _, gcollected = run_cf_gibbs(
        gmodel, gmodel.init_params(jax.random.PRNGKey(5)),
        jax.random.PRNGKey(6), jnp.asarray(fold.train, jnp.float32),
        burnin=40, maxepoch=160,
    )
    test_batch = CFBatch(
        users=jnp.asarray(fold.test[:, 0], jnp.int32),
        movies=jnp.asarray(fold.test[:, 1], jnp.int32),
    )
    gz = jax.vmap(lambda p: gmodel.predict(p, test_batch))(gcollected).mean(0)
    gibbs_pred = np.asarray(
        denormalize_and_cutoff(gz, fold.rating_mean, fold.rating_std))
    gibbs_seconds = time.time() - t1
    hh_g = bayespmf_head_to_head(fold, gibbs_pred)

    # posterior ensemble: the two engines (SGLD side-info / conjugate Gibbs)
    # have different model biases; their averaged prediction is still a pure
    # framework prediction (no test leakage) — reported as its own row
    ens_pred = 0.5 * (np.asarray(run.best_pred) + gibbs_pred)
    hh_e = bayespmf_head_to_head(fold, ens_pred)

    # cold-start slice: test ratings whose user has < 20 train ratings
    from gpt_tpu.diagnostics.cf_analysis import entity_frequencies

    userfreq = entity_frequencies(fold.train[:, 0], fold.num_users)
    users = fold.test[:, 0].astype(np.int64)
    cold = userfreq[users] < 20
    y_raw = fold.test[:, 2] * fold.rating_std + fold.rating_mean
    from gpt_tpu.diagnostics.cf_analysis import load_bayespmf_predictions

    bpmf = load_bayespmf_predictions()
    cold_ours = float(np.sqrt(np.mean((y_raw[cold] - run.best_pred[cold]) ** 2)))
    cold_gibbs = float(np.sqrt(np.mean((y_raw[cold] - gibbs_pred[cold]) ** 2)))
    cold_bpmf = float(np.sqrt(np.mean((y_raw[cold] - bpmf[cold]) ** 2)))

    cold_ens = float(np.sqrt(np.mean((y_raw[cold] - ens_pred[cold]) ** 2)))
    metrics = {
        "rmse_sgld_sideinfo": hh["rmse_ours"],
        "rmse_gibbs": hh_g["rmse_ours"],
        "rmse_ensemble": hh_e["rmse_ours"],
        "cold_user_rmse_ensemble": cold_ens,
        "rmse_bpmf": hh["rmse_bpmf"],
        "cold_user_rmse_sgld": cold_ours,
        "cold_user_rmse_gibbs": cold_gibbs,
        "cold_user_rmse_bpmf": cold_bpmf,
        "best_epoch": run.best_epoch,
        "sgld_epochs": maxepoch,
        "seconds_sgld": round(seconds, 1),
        "seconds_gibbs": round(gibbs_seconds, 1),
        "alignment_corr": float(np.corrcoef(y_raw, bpmf)[0, 1]),
    }
    metrics["avg_rmse_curve_every100"] = [
        round(float(v), 4) for v in run.avg_test_rmse[::100]
    ]
    append_record(os.path.join(ROOT, "RECORDS.jsonl"), "ml100k_bayespmf_head_to_head", metrics)
    print(json.dumps(metrics, indent=2))

    # the reference's 2-panel figure (100k_movielensExperiment.jl:1197-1208)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 1, figsize=(7, 8))
    for ax, kind, xlabel in (
        (axes[0], "user", "number of ratings by user"),
        (axes[1], "movie", "number of ratings on movie"),
    ):
        ours, bp = hh[f"{kind}_ours"], hh[f"{kind}_bpmf"]
        gib, ens = hh_g[f"{kind}_ours"], hh_e[f"{kind}_ours"]
        ax.plot(ours.freqs, ours.rmse, label="tensor-GP SGLD side-info (ours)")
        ax.plot(gib.freqs, gib.rmse, label="CF Gibbs (ours)")
        ax.plot(ens.freqs, ens.rmse, label="SGLD+Gibbs ensemble (ours)")
        ax.plot(bp.freqs, bp.rmse, label="BayesPMF")
        ax.set_xlabel(xlabel)
        ax.set_ylabel("test RMSE")
        ax.set_xscale("log")
        ax.legend()
    fig.suptitle("testRMSE by number of ratings on movie/user (u.data file split)")
    fig.tight_layout()
    out = os.path.join(ROOT, "plots", "bayespmf_rmse_by_freq.png")
    fig.savefig(out, dpi=120)
    print("wrote", out)


if __name__ == "__main__":
    main()
