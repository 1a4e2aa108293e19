"""Full-config RMSE parity runs against the reference's logged numbers.

Runs the real workloads end-to-end (intended for the TPU chip; works on CPU
too) and writes PARITY.md + RECORDS.jsonl. Reference targets:

- Power Plant no-tensor SGLD: exact-GP 4.0056, floor 17.13 (DataRecords:18-19)
- Power Plant tensor SGLD (n=150,r=20,Q=200): stored curve min 4.075
  (testRMSE_PP.h5), DataRecords:38 best 4.0732
- kin40k tensor SGLD (n=150,r=20,Q=200): stored curve min 0.2360
  (testRMSE_kin40k.h5)
- MovieLens-100k full-w side-info SGLD: stored curve min 0.9531
  (fullWresults.h5)
- TensorSynthData5D posterior recovery (SynthDataExperiment config)
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

from gpt_tpu.data import load_kin40k, load_movielens_100k, load_power_plant, load_tensor_synth
from gpt_tpu.experiments import configs as C
from gpt_tpu.experiments.movielens import run_movielens
from gpt_tpu.experiments.regression import run_fulltheta_regression, run_tensor_regression
from gpt_tpu.inference import SGLDConfig, run_sgld
from gpt_tpu.models import TensorGP
from gpt_tpu.models.tensor_gp import TensorGPParams
from gpt_tpu.utils.math import rmse
from gpt_tpu.utils.records import append_record

RECORDS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "RECORDS.jsonl")
results = {}


def log(name, **metrics):
    results[name] = metrics
    append_record(RECORDS, name, metrics)
    print(name, json.dumps(metrics), flush=True)


def pp_notensor():
    split = load_power_plant()
    t0 = time.time()
    run = run_fulltheta_regression(split, C.POWER_PLANT_NOTENSOR, jax.random.PRNGKey(17))
    log("pp_notensor",
        avg_pred_rmse=float(run.avg_pred_rmse),
        min_epoch_rmse=float(run.test_rmse.min()),
        last_rmse=float(run.test_rmse[-1]),
        rejected=int(run.rejected), seconds=round(time.time() - t0, 1),
        reference_exact_gp=4.0056, reference_floor=17.1331)


def pp_tensor():
    split = load_power_plant()
    preset = dataclasses.replace(C.POWER_PLANT_TENSOR, burnin=0, maxepoch=200, avg_last=50)
    t0 = time.time()
    run = run_tensor_regression(split, preset, jax.random.PRNGKey(17), transport="geodesic")
    log("pp_tensor_n150",
        min_epoch_rmse=float(run.test_rmse.min()),
        avg_pred_rmse=float(run.avg_pred_rmse),
        rejected=int(run.rejected), seconds=round(time.time() - t0, 1),
        reference_curve_min=4.0747, reference_best=4.0732)


def kin40k():
    split = load_kin40k()
    preset = dataclasses.replace(C.KIN40K_TENSOR, burnin=0, maxepoch=200, avg_last=50)
    t0 = time.time()
    run = run_tensor_regression(split, preset, jax.random.PRNGKey(17), transport="geodesic")
    log("kin40k_tensor",
        min_epoch_rmse=float(run.test_rmse.min()),
        avg_pred_rmse=float(run.avg_pred_rmse),
        rejected=int(run.rejected), seconds=round(time.time() - t0, 1),
        reference_curve_min=0.2360)


def movielens():
    fold = load_movielens_100k(1)
    t0 = time.time()
    run = run_movielens(fold, C.MOVIELENS_100K, jax.random.PRNGKey(17), maxepoch=200)
    log("ml100k_fullw_sideinfo",
        best_avg_rmse=run.best_rmse, best_epoch=run.best_epoch,
        final_inst_rmse=float(run.test_rmse[-1]),
        rejected=run.rejected, seconds=round(time.time() - t0, 1),
        reference_curve_min=0.9531)


def synth():
    ts = load_tensor_synth(5)
    model = TensorGP(n=5, r=2, D=5, I=jnp.asarray(ts.I), signal_var=0.01)
    phi = jnp.asarray(ts.phi, jnp.float32)
    y = jnp.asarray(ts.y[0.01], jnp.float32)
    params0 = model.init_params(jax.random.PRNGKey(1))
    cfg = SGLDConfig(eps=TensorGPParams(w=1e-5, U=1e-8), transport="geodesic")
    t0 = time.time()
    final, collected = run_sgld(
        model, params0, jax.random.PRNGKey(2), phi, y,
        m=10, config=cfg, burnin=250, maxepoch=50,
    )
    preds = jax.vmap(lambda p: model.predict(p, phi))(collected)
    post = float(rmse(jnp.mean(preds, 0), y))
    prior = float(rmse(model.predict(params0, phi), y))

    # conjugate Gibbs on the same problem — the better-mixing engine
    from gpt_tpu.inference import init_gibbs_params, run_gibbs

    g0 = init_gibbs_params(model, jax.random.PRNGKey(3))
    gfinal, gcol = run_gibbs(model, g0, jax.random.PRNGKey(4), phi, y,
                             num_iterations=120, burnin=40)
    gpreds = jax.vmap(lambda p: model.predict(p, phi))(gcol)
    gibbs_post = float(rmse(jnp.mean(gpreds, 0), y))
    log("synth5d_recovery",
        posterior_rmse_sgld=post, posterior_rmse_gibbs=gibbs_post,
        prior_rmse=prior, noise_sd=0.1,
        rejected=int(final.rejected), seconds=round(time.time() - t0, 1))


def movielens5():
    """The reference's headline metric: 5-fold mean of min test RMSE
    (``100k_movielensExperiment.jl:729-739``). All folds share one compiled
    program (identical shapes)."""
    rmses = []
    t0 = time.time()
    for fold in range(1, 6):
        f = load_movielens_100k(fold)
        run = run_movielens(f, C.MOVIELENS_100K, jax.random.PRNGKey(17), maxepoch=200)
        rmses.append(run.best_rmse)
        print(f"  fold {fold}: best avg RMSE {run.best_rmse:.4f}", flush=True)
    log("ml100k_5fold",
        fold_rmses=[round(r, 4) for r in rmses],
        mean_min_rmse=float(np.mean(rmses)),
        seconds=round(time.time() - t0, 1),
        reference_curve_min_fold1=0.9531)


def ml_gibbs():
    """BPMF-style CF Gibbs on fold 1 vs the BayesPMF artifact predictions
    (``bayespmf_pred.h5``, consumed at ``100k_movielensExperiment.jl:1190``),
    plus the RMSE-by-frequency breakdown."""
    from gpt_tpu.diagnostics.cf_analysis import (
        entity_frequencies, load_bayespmf_predictions, rmse_by_frequency)
    from gpt_tpu.inference import run_cf_gibbs
    from gpt_tpu.models.cf import CFBatch, CFModel, denormalize_and_cutoff

    fold = load_movielens_100k(1)
    P = C.MOVIELENS_100K
    model = CFModel(n1=fold.num_users, n2=fold.num_movies, r=P.r,
                    signal_var=P.signal_var, sigma_u=0.3)
    params0 = model.init_params(jax.random.PRNGKey(5))
    t0 = time.time()
    final, collected = run_cf_gibbs(
        model, params0, jax.random.PRNGKey(6),
        jnp.asarray(fold.train, jnp.float32),
        burnin=20, maxepoch=60,
    )
    test_batch = CFBatch(
        users=jnp.asarray(fold.test[:, 0], jnp.int32),
        movies=jnp.asarray(fold.test[:, 1], jnp.int32),
    )
    preds_z = jax.vmap(lambda p: model.predict(p, test_batch))(collected).mean(0)
    preds = np.asarray(denormalize_and_cutoff(preds_z, fold.rating_mean, fold.rating_std))
    y_raw = fold.test[:, 2] * fold.rating_std + fold.rating_mean
    ours = float(np.sqrt(np.mean((preds - y_raw) ** 2)))

    # NOTE: the bayespmf_pred.h5 artifact has ~0 correlation with u1.test in
    # its stored order (its split/ordering is unrecorded), so a head-to-head
    # RMSE against it is not meaningful; we report our Gibbs RMSE and the
    # per-frequency breakdown (the reference's RMSEbyfreq analysis) alone.
    uf = entity_frequencies(fold.train[:, 0].astype(int), fold.num_users)
    ours_f = rmse_by_frequency(fold.test[:, 0].astype(int), preds - y_raw, uf,
                               bins=np.array([0, 6, 21, 51, 1000]))
    log("ml100k_gibbs",
        gibbs_rmse=ours,
        gibbs_rmse_by_userfreq=[round(float(v), 4) for v in ours_f.rmse],
        userfreq_bins="0-5, 6-20, 21-50, 51+",
        seconds=round(time.time() - t0, 1))


def gmc():
    """PP tensor GMC, L=30 — reference: test RMSE 4.1126 at 100 epochs in
    23633 s, 4.0598 at 500 epochs in 137614 s (DataRecords.txt:112-118)."""
    from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
    from gpt_tpu.inference import GMCConfig, run_gmc
    from gpt_tpu.models import sample_core_indices

    split = load_power_plant()
    P = C.POWER_PLANT_TENSOR
    key = jax.random.PRNGKey(17)
    kI, kf, kp, ks = jax.random.split(key, 4)
    D = split.X_train.shape[1]
    I = sample_core_indices(kI, P.r, D, P.Q)
    rff = sample_tensor_rff(kf, P.n, D)
    sc = tensor_phi_scale(P.n, P.Q, D)
    phi_tr = tensor_features(jnp.asarray(split.X_train, jnp.float32), rff,
                             P.length_scale, P.sigma_RBF, sc)
    phi_te = tensor_features(jnp.asarray(split.X_test, jnp.float32), rff,
                             P.length_scale, P.sigma_RBF, sc)
    y_tr = jnp.asarray(split.y_train, jnp.float32)
    # MH-exact sampler needs an accurate Hamiltonian: bf16 MXU rounding on the
    # full-batch likelihood zeroes the acceptance probability.
    model = TensorGP(n=P.n, r=P.r, D=D, I=I, signal_var=P.signal_var,
                     precision="highest")
    y_te = jnp.asarray(split.y_test, jnp.float32)
    t0 = time.time()
    # warm start from a short SGLD run (GMC from a random init wastes its
    # budget traversing the prior; the reference burns thousands of seconds
    # doing exactly that)
    warm_cfg = SGLDConfig(eps=TensorGPParams(w=P.epsw, U=P.epsU), transport="geodesic")
    warm, _ = run_sgld(model, model.init_params(kp), jax.random.fold_in(ks, 1),
                       phi_tr, y_tr, m=P.m, config=warm_cfg, burnin=30, maxepoch=0)
    params0 = warm.params
    # probe step sizes (the reference's eps comes from a commented block;
    # target a healthy acceptance rate, then run the full budget)
    chosen = None
    for epsw, epsU in [(P.epsw, P.epsU), (P.epsw / 4, P.epsU / 4), (P.epsw / 16, P.epsU / 16)]:
        cfg = GMCConfig(eps=TensorGPParams(w=epsw, U=epsU), num_leapfrog=30)
        _, _, acc = run_gmc(model, params0, ks, phi_tr, y_tr,
                            config=cfg, burnin=0, maxepoch=8,
                            collect_fn=lambda p: ())
        a = float(jnp.mean(jnp.minimum(acc, 1.0)))
        print(f"  gmc probe epsw={epsw:g}: accept={a:.2f}", flush=True)
        chosen = (epsw, epsU, a)
        if 0.2 <= a <= 0.95:
            break
    epsw, epsU, _ = chosen
    cfg = GMCConfig(eps=TensorGPParams(w=epsw, U=epsU), num_leapfrog=30)
    final, collected, accept = run_gmc(
        model, params0, ks, phi_tr, y_tr,
        config=cfg, burnin=20, maxepoch=80,
        collect_fn=lambda p: model.predict(p, phi_te),
    )
    dt = time.time() - t0
    mean_pred = jnp.mean(collected, axis=0)
    test_rmse = float(split.y_std * rmse(mean_pred, y_te))
    log("pp_gmc_L30",
        test_rmse=test_rmse, epsw=epsw, epsU=epsU,
        mean_accept=float(jnp.mean(jnp.minimum(accept, 1.0))),
        seconds=round(dt, 1),
        reference_rmse_100ep=4.1126, reference_seconds_100ep=23633)


def write_parity_md():
    # merge with the latest prior results so partial re-runs keep the table full
    from gpt_tpu.utils.records import read_records

    prior = {}
    for rec in read_records(RECORDS):  # chronological; keep the latest
        prior[rec["experiment"]] = rec["metrics"]
    for name, metrics in prior.items():
        results.setdefault(name, metrics)
    lines = [
        "# PARITY — full-config runs vs reference logged numbers",
        "",
        f"Backend: {jax.default_backend()} ({jax.devices()[0].device_kind}); float32.",
        "",
        "| Workload | Ours | Reference | Source |",
        "|---|---|---|---|",
    ]
    r = results
    if "pp_notensor" in r:
        m = r["pp_notensor"]
        lines.append(f"| PP no-tensor SGLD (n=2000, 100 ep) avg-pred RMSE | {m['avg_pred_rmse']:.4f} | 4.0056 (exact GP) / 17.13 (floor) | DataRecords.txt:18-19 |")
    if "pp_tensor_n150" in r:
        m = r["pp_tensor_n150"]
        lines.append(f"| PP tensor SGLD (n=150,r=20,Q=200, 200 ep) min epoch RMSE | {m['min_epoch_rmse']:.4f} | 4.0747 (curve min) / 4.0732 (best) | testRMSE_PP.h5, DataRecords.txt:38 |")
    if "kin40k_tensor" in r:
        m = r["kin40k_tensor"]
        lines.append(f"| kin40k tensor SGLD (200 ep) min epoch RMSE | {m['min_epoch_rmse']:.4f} | 0.2360 (curve min) | testRMSE_kin40k.h5 |")
    if "ml100k_fullw_sideinfo" in r:
        m = r["ml100k_fullw_sideinfo"]
        lines.append(f"| ML-100k full-w side-info SGLD (200 ep) best avg RMSE | {m['best_avg_rmse']:.4f} | 0.9531 (curve min) | fullWresults.h5 |")
    if "ml100k_5fold" in r:
        m = r["ml100k_5fold"]
        lines.append(
            f"| ML-100k 5-fold mean of best avg RMSE | {m['mean_min_rmse']:.4f} | "
            f"0.9531 (fold-1 curve min) | fullWresults.h5, :729-739 |")
    if "ml100k_gibbs" in r:
        m = r["ml100k_gibbs"]
        lines.append(
            f"| ML-100k BPMF-style CF Gibbs (fold 1, 60 sweeps, 16 s) | {m['gibbs_rmse']:.4f} | "
            f"— (bayespmf_pred.h5 row order uncorrelated with u1.test; not comparable) | 100k_movielensExperiment.jl:944-1129 |")
    if "pp_gmc_L30" in r:
        m = r["pp_gmc_L30"]
        lines.append(
            f"| PP tensor GMC L=30 (100 ep) posterior-mean test RMSE / wall time | "
            f"{m['test_rmse']:.4f} / {m['seconds']:.0f}s | 4.1126 / 23633s | DataRecords.txt:112-114 |")
    if "synth5d_recovery" in r:
        m = r["synth5d_recovery"]
        lines.append(
            f"| TensorSynth5D posterior RMSE (noise sd 0.1): SGLD ref-config / Gibbs | "
            f"{m['posterior_rmse_sgld']:.4f} / {m['posterior_rmse_gibbs']:.4f} | "
            f"prior {m['prior_rmse']:.3f} → noise floor ≈0.1 | SynthDataExperiment.jl, TGP.jl |")
    lines += ["", "Timing and rejection counts per run are in `RECORDS.jsonl`."]
    with open(os.path.join(os.path.dirname(RECORDS), "PARITY.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    which = sys.argv[1:] or ["pp_notensor", "pp_tensor", "synth", "kin40k",
                             "movielens", "gmc", "movielens5", "ml_gibbs"]
    for name in which:
        {"pp_notensor": pp_notensor, "pp_tensor": pp_tensor, "kin40k": kin40k,
         "movielens": movielens, "synth": synth, "gmc": gmc,
         "movielens5": movielens5, "ml_gibbs": ml_gibbs}[name]()
    write_parity_md()
    print("PARITY.md written")
