"""Multi-chain GMC with cross-chain convergence diagnostics → RECORDS.

16 vmapped GMC chains on the PP tensor parity config; reports mean accept
probability, split-R̂ and ESS of the posterior-mean prediction at held-out
points (the function-space quantities the model is used for), matching the
rstan Rhat/n_eff reporting the reference leaned on
(``temperature_uk/tensor2d_kron.r:42-43``).
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
from gpt_tpu.diagnostics.mcmc import effective_sample_size, potential_scale_reduction
from gpt_tpu.experiments.configs import POWER_PLANT_TENSOR as P
from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.inference import GMCConfig, SGLDConfig, run_gmc, run_sgld
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams
from gpt_tpu.utils.records import append_record

RECORDS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "RECORDS.jsonl")


def main():
    # defaults sized for convergence: jittered-L trajectories + enough kept
    # epochs that per-probe ESS clears 100 (GMC runs ~2k leapfrogs/s, so 600
    # epochs x 16 chains is a few minutes, not the reference's 38 h)
    argv = [int(a) for a in sys.argv[1:]]
    C, burnin, keep, L = (argv + [16, 150, 450, 30][len(argv):])[:4]
    split = load_power_plant()
    key = jax.random.PRNGKey(23)
    kI, kf, kp, ks = jax.random.split(key, 4)
    D = split.X_train.shape[1]
    I = sample_core_indices(kI, P.r, D, P.Q)
    rff = sample_tensor_rff(kf, P.n, D)
    scale = tensor_phi_scale(P.n, P.Q, D)
    phi = tensor_features(jnp.asarray(split.X_train, jnp.float32), rff,
                          P.length_scale, P.sigma_RBF, scale)
    y = jnp.asarray(split.y_train, jnp.float32)
    phi_probe = tensor_features(jnp.asarray(split.X_test[:32], jnp.float32), rff,
                                P.length_scale, P.sigma_RBF, scale)

    model = TensorGP(n=P.n, r=P.r, D=D, I=I, signal_var=P.signal_var,
                     precision="highest")
    # segmented execution: the tunneled chip kills single dispatches longer
    # than ~1-2 min (observed: 600-epoch one-shot run -> "TPU device error";
    # 60-epoch run fine), so the run is chained as (adaptive burn-in) +
    # sampling segments, continuing params across dispatches.
    SEG = max(50, 150 * 30 // L)  # keep each dispatch well under the limit
    cfg = GMCConfig(
        eps=TensorGPParams(w=P.epsw, U=P.epsU), num_leapfrog=L,
        jitter_steps=True, adapt_step_size=True,
    )
    # per-chain SGLD warm start (the parity recipe: GMC from random inits
    # wastes its budget traversing the prior)
    warm_cfg = SGLDConfig(eps=TensorGPParams(w=P.epsw, U=P.epsU), transport="polar")
    inits = jax.vmap(model.init_params)(jax.random.split(kp, C))
    warm, _ = run_sgld(model, inits, jax.random.fold_in(ks, 1), phi, y,
                       m=P.m, config=warm_cfg, burnin=30, maxepoch=0,
                       collect_fn=lambda p: ())
    params0 = warm.params
    keys = jax.random.split(ks, C)

    collect = lambda p: model.predict(p, phi_probe)  # function-space probe

    t0 = time.time()
    # 1. adaptive burn-in, segmented like everything else (jittered-L epochs
    # compute all L leapfrogs, so a 450-epoch burn-in in one dispatch blows
    # the ~2 min tunnel budget). Each segment restarts dual averaging from
    # the chained params; the LAST segment's averaged eta is kept (it starts
    # closest to the typical set).
    SEGB = 100
    nburn = -(-burnin // SEGB)
    warm_run = jax.jit(jax.vmap(partial(
        run_gmc, model, phi=phi, y=y, config=cfg,
        burnin=SEGB, maxepoch=0, collect_fn=lambda p: (),
    )))
    params, acc_b = params0, None
    for b in range(nburn):
        keys = jax.vmap(lambda k: jax.random.fold_in(k, 1000 + b))(keys)
        params, _, acc_b, eta_bar = warm_run(params, keys)
        jax.block_until_ready(params.w)
    eta_med = float(jnp.median(eta_bar))
    # 2. sampling segments with the adapted step frozen (shared median eta,
    # the rstan-style one-step-size-per-run convention) — detailed balance
    # holds exactly within every kept draw
    cfg_frozen = GMCConfig(
        eps=TensorGPParams(w=P.epsw * eta_med**2, U=P.epsU * eta_med**2),
        num_leapfrog=L, jitter_steps=True, adapt_step_size=False,
    )
    seg_run = jax.jit(jax.vmap(partial(
        run_gmc, model, phi=phi, y=y, config=cfg_frozen,
        burnin=0, maxepoch=SEG, collect_fn=collect,
    )))
    probes_segs, accept_segs = [], [acc_b]
    nseg = -(-keep // SEG)
    for s in range(nseg):
        keys = jax.vmap(lambda k: jax.random.fold_in(k, s + 1))(keys)
        params, pr, acc = seg_run(params, keys)
        jax.block_until_ready(pr)
        probes_segs.append(np.asarray(pr))
        accept_segs.append(acc)
    wall = time.time() - t0
    probes = np.concatenate(probes_segs, axis=1)[:, :keep]  # (C, keep, 32)
    accept = np.concatenate([np.asarray(a) for a in accept_segs], axis=-1)
    eta_bar = np.asarray(eta_bar)
    rhat = np.asarray(potential_scale_reduction(jnp.asarray(probes)))
    ess = np.asarray(effective_sample_size(jnp.asarray(probes)))
    m = dict(
        chains=C, burnin=burnin, kept=keep, num_leapfrog=L,
        adapt_step_size=True,
        eta_bar_median=round(float(np.median(np.asarray(eta_bar))), 4),
        mean_accept=round(float(np.mean(np.asarray(accept))), 3),
        rhat_max=round(float(rhat.max()), 4),
        rhat_median=round(float(np.median(rhat)), 4),
        ess_min=round(float(ess.min()), 1),
        ess_median=round(float(np.median(ess)), 1),
        seconds=round(wall, 1),
        leapfrogs_per_s=round(C * (burnin + keep) * L / wall, 1),
    )
    append_record(RECORDS, "gmc_multichain_diagnostics", m)
    print(m, flush=True)


if __name__ == "__main__":
    main()
