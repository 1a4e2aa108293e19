"""Merged GMC fleet + full diagnostics on kin40k (r5 ask #7).

Every r4 GMC parity/diagnostics record is PP-only (n=150, r=20, Q=200, D=4).
kin40k doubles the factor count (D=8 — ``kin40kExperiment.jl:38-52``), the
shape that stresses the folded-layout Pallas gradient and the merged-lane
projection. This runs the chain-merged GMC fleet END-TO-END on the kin40k
tensor config (10k train / 30k test) with the standard probe battery and a
posterior-mean-prediction parity row against the SGLD numbers
(0.2365 min-epoch / 0.2207 avg-pred; reference curve-min 0.2360).

Writes RECORDS ``kin40k_gmc_diagnostics``.
Usage: kin40k_gmc.py [C burnin keep L]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from gpt_tpu.data import load_kin40k
from gpt_tpu.diagnostics.mcmc import effective_sample_size, potential_scale_reduction
from gpt_tpu.experiments.configs import KIN40K_TENSOR as P
from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.inference import GMCConfig, SGLDConfig, run_sgld
from gpt_tpu.inference.gmc import run_gmc_chains
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams
from gpt_tpu.utils.records import append_record

RECORDS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "RECORDS.jsonl")


def main():
    argv = [int(a) for a in sys.argv[1:]]
    C, burnin, keep, L = (argv + [16, 150, 450, 30][len(argv):])[:4]
    split = load_kin40k()
    key = jax.random.PRNGKey(41)
    kI, kf, kp, ks = jax.random.split(key, 4)
    D = split.X_train.shape[1]
    I = sample_core_indices(kI, P.r, D, P.Q)
    rff = sample_tensor_rff(kf, P.n, D)
    scale = tensor_phi_scale(P.n, P.Q, D)
    phi = tensor_features(jnp.asarray(split.X_train, jnp.float32), rff,
                          P.length_scale, P.sigma_RBF, scale)
    y = jnp.asarray(split.y_train, jnp.float32)
    phi_test = tensor_features(jnp.asarray(split.X_test, jnp.float32), rff,
                               P.length_scale, P.sigma_RBF, scale)
    y_test = jnp.asarray(split.y_test, jnp.float32)

    model = TensorGP(n=P.n, r=P.r, D=D, I=I, signal_var=P.signal_var,
                     precision="highest", contraction="merged")
    vprobe = jax.random.normal(jax.random.fold_in(key, 99), (P.n,))
    vprobe = vprobe / jnp.linalg.norm(vprobe)

    def collect(p):
        # probe battery (gmc_diagnostics parity) + fleet-mean test prediction
        preds = model.predict(p, phi_test[:32])                  # (C, 32)
        w2 = p.w[:, :32] ** 2
        align = jnp.abs(jnp.einsum("cdnr,n->cdr", p.U, vprobe))
        align = align.reshape(p.w.shape[0], -1)[:, :32]
        probes = jnp.concatenate([preds, w2, align], axis=-1)    # (C, 96)
        mean_pred = jnp.mean(model.predict(p, phi_test), axis=0) # (Ntest,)
        return probes, mean_pred

    # SGLD warm start. adapt_eps is load-bearing here: at the reference's
    # kin40k eps (1e-4) 2/16 seeds cascade w to ~1e34 FINITE within 30
    # epochs (measured r5) — the init-scale trust region rejects the
    # cascade and η backs off, exactly the temperature-Kron recovery class.
    warm_cfg = SGLDConfig(eps=TensorGPParams(w=P.epsw, U=P.epsU),
                          transport="polar", adapt_eps=True)
    inits = jax.vmap(model.init_params)(jax.random.split(kp, C))
    warm, _ = run_sgld(model, inits, jax.random.fold_in(ks, 1), phi, y,
                       m=P.m, config=warm_cfg, burnin=30, maxepoch=0,
                       collect_fn=lambda p: ())
    params = warm.params
    wn = jnp.linalg.norm(params.w, axis=-1)
    print(f"warm start: rejected={int(warm.rejected)} "
          f"w-norm range [{float(wn.min()):.2f}, {float(wn.max()):.2f}]",
          flush=True)
    assert bool(jnp.all(wn < 1e4)), "warm start diverged"

    cfg = GMCConfig(eps=TensorGPParams(w=P.epsw, U=P.epsU), num_leapfrog=L,
                    jitter_steps=True, adapt_step_size=True,
                    geodesic_method="taylor")
    # kin40k leapfrogs cost ~4x PP (2x N, 2x D): smaller segments
    SEGB = 40
    warm_run = jax.jit(partial(
        run_gmc_chains, model, phi=phi, y=y, config=cfg,
        burnin=SEGB, maxepoch=0, collect_fn=lambda p: (),
        grad_backend="pallas",
    ))
    t0 = time.time()
    acc_b = None
    for b in range(-(-burnin // SEGB)):
        kb = jax.random.fold_in(ks, 1000 + b)
        params, _, acc_b, eta_bar = warm_run(params, kb)
        jax.block_until_ready(params.w)
        print(f"burn seg {b+1}: acc {np.asarray(acc_b).mean():.3f} "
              f"eta {float(jnp.median(eta_bar)):.3g} t={time.time()-t0:.0f}s",
              flush=True)
    eta2 = jnp.asarray(eta_bar) ** 2
    cfg_frozen = GMCConfig(
        eps=TensorGPParams(w=P.epsw * eta2, U=P.epsU * eta2),
        num_leapfrog=L, jitter_steps=True, adapt_step_size=False,
        geodesic_method="taylor")
    SEG = 50
    seg_run = jax.jit(partial(
        run_gmc_chains, model, phi=phi, y=y, config=cfg_frozen,
        burnin=0, maxepoch=SEG, collect_fn=collect,
        grad_backend="pallas",
    ))
    probes_segs, accept_segs, predsum = [], [np.asarray(acc_b)], None
    npred = 0
    for s in range(-(-keep // SEG)):
        kseg = jax.random.fold_in(ks, 2000 + s)
        params, (pr, mp), acc = seg_run(params, kseg)
        jax.block_until_ready(pr)
        probes_segs.append(np.asarray(pr))
        accept_segs.append(np.asarray(acc))
        seg_sum = np.asarray(jnp.sum(mp, axis=0))
        predsum = seg_sum if predsum is None else predsum + seg_sum
        npred += mp.shape[0]
        print(f"seg {s+1}: acc {accept_segs[-1].mean():.3f} "
              f"t={time.time()-t0:.0f}s", flush=True)
    wall = time.time() - t0

    probes = np.concatenate(probes_segs, axis=0)[:keep].transpose(1, 0, 2)
    accept = np.concatenate(accept_segs, axis=0)
    rhat = np.asarray(potential_scale_reduction(jnp.asarray(probes)))
    ess = np.asarray(effective_sample_size(jnp.asarray(probes)))
    # posterior-mean prediction (MC average over chains x kept draws),
    # de-normalised by the training-label std (standardize_split convention)
    mc_pred = predsum / npred
    rmse = float(np.sqrt(np.mean((mc_pred - np.asarray(y_test)) ** 2)))
    rmse_denorm = rmse * float(split.y_std)
    nfun = 32
    m = dict(
        chains=C, burnin=burnin, kept=int(probes.shape[1]), num_leapfrog=L,
        geodesic="taylor", grad_backend="pallas", D=D, n=P.n, r=P.r, Q=P.Q,
        eta_bar_median=round(float(np.median(np.asarray(eta_bar))), 4),
        mean_accept=round(float(accept.mean()), 3),
        rhat_max=round(float(rhat.max()), 4),
        rhat_max_function_space=round(float(rhat[:nfun].max()), 4),
        rhat_max_param_space=round(float(rhat[nfun:].max()), 4),
        ess_min=round(float(ess.min()), 1),
        ess_median=round(float(np.median(ess)), 1),
        posterior_mean_rmse=round(rmse_denorm, 4),
        reference_sgld_avg_pred=0.2207,
        reference_sgld_min_epoch=0.2365,
        reference_curve_min=0.2360,
        seconds=round(wall, 1),
        leapfrogs_per_s=round(C * (burnin + keep) * L / wall, 1),
    )
    append_record(RECORDS, "kin40k_gmc_diagnostics", m)
    print(m, flush=True)


if __name__ == "__main__":
    main()
