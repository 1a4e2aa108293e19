"""Manifold NUTS vs fixed-L GMC: ESS per gradient on the PP parity config.

VERDICT r3 ask #10 ("Done = ESS/gradient ≥ 1.5× fixed-L GMC on the parity
config"). Both samplers run the same geodesic leapfrog at the same per-leaf
step scales on the same warm-started chains; GMC spends L+1 gradients per
epoch at fixed L, NUTS spends its dynamically-chosen tree size. The metric
is min/median ESS of the 32-point function-space probe divided by total
gradient evaluations.

Writes RECORDS ``manifold_nuts_vs_gmc``.
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

from gpt_tpu.data import load_power_plant
from gpt_tpu.diagnostics.mcmc import effective_sample_size
from gpt_tpu.experiments.configs import POWER_PLANT_TENSOR as P
from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.inference import GMCConfig, SGLDConfig, run_sgld
from gpt_tpu.inference.gmc import run_gmc_chains
from gpt_tpu.inference.manifold_nuts import run_manifold_nuts
from gpt_tpu.inference.nuts import NUTSConfig
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams
from gpt_tpu.utils.records import append_record

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    argv = [int(a) for a in sys.argv[1:]]
    C, warm, keep, L, md = (argv + [8, 100, 300, 30, 7][len(argv):])[:5]
    split = load_power_plant()
    key = jax.random.PRNGKey(31)
    kI, kf, kp, ks = jax.random.split(key, 4)
    D = split.X_train.shape[1]
    I = sample_core_indices(kI, P.r, D, P.Q)
    rff = sample_tensor_rff(kf, P.n, D)
    scale = tensor_phi_scale(P.n, P.Q, D)
    phi = tensor_features(jnp.asarray(split.X_train, jnp.float32), rff,
                          P.length_scale, P.sigma_RBF, scale)
    y = jnp.asarray(split.y_train, jnp.float32)
    phi_probe = tensor_features(jnp.asarray(split.X_test[:32], jnp.float32),
                                rff, P.length_scale, P.sigma_RBF, scale)
    eps = TensorGPParams(w=P.epsw, U=P.epsU)

    model = TensorGP(n=P.n, r=P.r, D=D, I=I, signal_var=P.signal_var,
                     precision="highest", contraction="merged")
    collect = lambda p: model.predict(
        jax.tree.map(lambda a: a[None], p), phi_probe)[0]

    # shared warm start; adapt_eps guards against the headline config's
    # known ~5% per-chain divergence rate (RECORDS headline_config_marginality
    # — a blown-up warm chain has logp = -inf, which poisons H0 and every
    # downstream diagnostic with inf - inf = NaN)
    warm_cfg = SGLDConfig(eps=eps, transport="polar", adapt_eps=True)
    inits = jax.vmap(model.init_params)(jax.random.split(kp, C))
    wstate, _ = run_sgld(model, inits, jax.random.fold_in(ks, 1), phi, y,
                         m=P.m, config=warm_cfg, burnin=30, maxepoch=0,
                         collect_fn=lambda p: ())
    params0 = wstate.params

    # --- fixed-L GMC (jittered, adapted) — the r3-style baseline ---------
    t0 = time.time()
    SEG = 100
    cfg = GMCConfig(eps=eps, num_leapfrog=L, jitter_steps=True,
                    adapt_step_size=True, geodesic_method="taylor")
    pg, _, _, eta_bar = jax.jit(partial(
        run_gmc_chains, model, phi=phi, y=y, config=cfg, burnin=warm,
        maxepoch=0, collect_fn=lambda p: (), grad_backend="pallas",
    ))(params0, jax.random.fold_in(ks, 2))
    eta2 = jnp.asarray(eta_bar) ** 2
    cfg_f = GMCConfig(eps=TensorGPParams(w=P.epsw * eta2, U=P.epsU * eta2),
                      num_leapfrog=L, jitter_steps=True,
                      adapt_step_size=False, geodesic_method="taylor")
    seg_run = jax.jit(partial(
        run_gmc_chains, model, phi=phi, y=y, config=cfg_f, burnin=0,
        maxepoch=SEG, collect_fn=lambda p: model.predict(p, phi_probe),
        grad_backend="pallas",
    ))
    probes = []
    for s in range(-(-keep // SEG)):
        pg, pr, _ = seg_run(pg, jax.random.fold_in(ks, 100 + s))
        jax.block_until_ready(pr)
        probes.append(np.asarray(pr))
    pr_g = np.concatenate(probes, axis=0)[:keep].transpose(1, 0, 2)
    gmc_s = time.time() - t0
    # jittered L ~ U[1, L]: expected (L+1)/2 + 1 gradients per epoch
    gmc_grads = C * (warm + keep) * ((L + 1) / 2 + 1)
    ess_g = np.asarray(effective_sample_size(jnp.asarray(pr_g)))

    # --- manifold NUTS (vmapped chains, segmented) -----------------------
    t1 = time.time()
    ncfg = NUTSConfig(max_depth=md, init_step_size=1.0)
    run_n = jax.jit(jax.vmap(partial(
        run_manifold_nuts, model, phi=phi, y=y, eps=eps,
        num_warmup=warm, num_samples=keep, config=ncfg, collect_fn=collect,
    )))
    samples, stats, step = run_n(
        params0, jax.random.split(jax.random.fold_in(ks, 3), C))
    jax.block_until_ready(samples)
    nuts_s = time.time() - t1
    pr_n = np.asarray(samples)  # (C, keep, 32)
    # warmup gradient cost approximated by the sampling-phase mean tree size
    n_lf = np.asarray(stats["n_leapfrog"])
    nuts_grads = float(n_lf.sum() + C * warm * n_lf.mean() + n_lf.size)
    ess_n = np.asarray(effective_sample_size(jnp.asarray(pr_n)))

    epg_g = float(ess_g.min()) / gmc_grads
    epg_n = float(ess_n.min()) / nuts_grads
    m = dict(
        chains=C, warmup=warm, kept=keep, gmc_L=L, nuts_max_depth=md,
        gmc=dict(ess_min=round(float(ess_g.min()), 1),
                 ess_median=round(float(np.median(ess_g)), 1),
                 grads=int(gmc_grads), seconds=round(gmc_s, 1),
                 ess_min_per_kgrad=round(1000 * epg_g, 3)),
        nuts=dict(ess_min=round(float(ess_n.min()), 1),
                  ess_median=round(float(np.median(ess_n)), 1),
                  grads=int(nuts_grads), seconds=round(nuts_s, 1),
                  mean_tree=round(float(n_lf.mean()), 1),
                  divergent=int(np.asarray(stats["diverged"]).sum()),
                  mean_accept=round(float(np.asarray(stats["accept_stat"]).mean()), 3),
                  ess_min_per_kgrad=round(1000 * epg_n, 3)),
        nuts_over_gmc_ess_per_grad=round(epg_n / max(epg_g, 1e-12), 2),
    )
    append_record(os.path.join(ROOT, "RECORDS.jsonl"),
                  "manifold_nuts_vs_gmc", m)
    print(m, flush=True)


if __name__ == "__main__":
    main()
