"""Multi-chain GMC with cross-chain convergence diagnostics → RECORDS.

A chain-MERGED GMC fleet (``run_gmc_chains`` + ``contraction="merged"`` +
Taylor geodesics + the fused Pallas gradient) on the PP tensor parity config;
reports mean accept probability, split-R̂ and ESS over BOTH probe families:

- **function space** — posterior predictions at 32 held-out points (what the
  model is used for), and
- **parameter space** — symmetry-INVARIANT scalars: ``w_q²`` and the factor
  alignments ``|U_d^T v|`` against a fixed probe vector. (Raw ``w``/``U``
  coordinates are unusable for cross-chain R̂: flipping the sign of a factor
  column and of the ``w_q`` it touches is an exact model symmetry, so chains
  legitimately settle in different sign orthants. The lattice ``I`` pins
  column *roles*, so sign is the only residual symmetry — squares and
  absolute alignments are invariant.)

Matches the rstan Rhat/n_eff reporting the reference leaned on
(``temperature_uk/tensor2d_kron.r:42-43``), with per-chain accept/divergence
stats the rstan reports also carry.
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
from gpt_tpu.inference import GMCConfig, SGLDConfig, run_sgld
from gpt_tpu.inference.gmc import run_gmc_chains
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams
from gpt_tpu.utils.records import append_record

RECORDS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "RECORDS.jsonl")


def main():
    # kept epochs doubled vs r3 (VERDICT r3 ask #4): target R̂ ≤ 1.01,
    # ESS min ≥ 400 at rstan-report quality
    argv = [int(a) for a in sys.argv[1:]]
    C, burnin, keep, L = (argv + [16, 200, 900, 30][len(argv):])[:4]
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
                     precision="highest", contraction="merged")
    vprobe = jax.random.normal(jax.random.fold_in(key, 99), (P.n,))
    vprobe = vprobe / jnp.linalg.norm(vprobe)

    def collect(p):
        # p is chain-stacked (C, ...). function-space + invariant param-space
        preds = model.predict(p, phi_probe)                      # (C, 32)
        w2 = p.w[:, :32] ** 2                                    # (C, 32)
        align = jnp.abs(jnp.einsum("cdnr,n->cdr", p.U, vprobe))  # (C, D, r)
        align = align.reshape(p.w.shape[0], -1)[:, :32]
        return jnp.concatenate([preds, w2, align], axis=-1)      # (C, 96)

    # segmented execution: the tunneled chip kills single dispatches longer
    # than ~1-2 min, so the run chains (adaptive burn-in) + sampling segments,
    # continuing params across dispatches.
    SEG = max(50, 150 * 30 // L)
    cfg = GMCConfig(
        eps=TensorGPParams(w=P.epsw, U=P.epsU), num_leapfrog=L,
        jitter_steps=True, adapt_step_size=True,
        geodesic_method="taylor",
    )
    # per-chain SGLD warm start (GMC from random inits wastes its budget
    # traversing the prior)
    warm_cfg = SGLDConfig(eps=TensorGPParams(w=P.epsw, U=P.epsU), transport="polar")
    inits = jax.vmap(model.init_params)(jax.random.split(kp, C))
    warm, _ = run_sgld(model, inits, jax.random.fold_in(ks, 1), phi, y,
                       m=P.m, config=warm_cfg, burnin=30, maxepoch=0,
                       collect_fn=lambda p: ())
    params = warm.params

    t0 = time.time()
    # 1. adaptive burn-in, segmented; each segment restarts dual averaging
    # from the chained params; the LAST segment's per-chain averaged eta is
    # kept (it starts closest to the typical set)
    SEGB = 100
    nburn = -(-burnin // SEGB)
    warm_run = jax.jit(partial(
        run_gmc_chains, model, phi=phi, y=y, config=cfg,
        burnin=SEGB, maxepoch=0, collect_fn=lambda p: (),
        grad_backend="pallas",
    ))
    acc_b = None
    for b in range(nburn):
        kb = jax.random.fold_in(ks, 1000 + b)
        params, _, acc_b, eta_bar = warm_run(params, kb)
        jax.block_until_ready(params.w)
    # 2. sampling segments with per-chain adapted steps frozen (each chain
    # is a valid fixed-eps sampler; detailed balance exact per kept draw)
    eta2 = jnp.asarray(eta_bar) ** 2
    cfg_frozen = GMCConfig(
        eps=TensorGPParams(w=P.epsw * eta2, U=P.epsU * eta2),
        num_leapfrog=L, jitter_steps=True, adapt_step_size=False,
        geodesic_method="taylor",
    )
    seg_run = jax.jit(partial(
        run_gmc_chains, model, phi=phi, y=y, config=cfg_frozen,
        burnin=0, maxepoch=SEG, collect_fn=collect,
        grad_backend="pallas",
    ))
    probes_segs, accept_segs = [], [np.asarray(acc_b)]
    nseg = -(-keep // SEG)
    for s in range(nseg):
        kseg = jax.random.fold_in(ks, 2000 + s)
        params, pr, acc = seg_run(params, kseg)
        jax.block_until_ready(pr)
        probes_segs.append(np.asarray(pr))
        accept_segs.append(np.asarray(acc))
    wall = time.time() - t0
    # collected shape per segment: (epochs, C, 96) → (C, keep, 96)
    probes = np.concatenate(probes_segs, axis=0)[:keep].transpose(1, 0, 2)
    accept = np.concatenate(accept_segs, axis=0)  # (epochs, C)

    rhat = np.asarray(potential_scale_reduction(jnp.asarray(probes)))
    ess = np.asarray(effective_sample_size(jnp.asarray(probes)))
    nfun = 32
    divergent = (accept < 1e-8).sum(axis=0)  # per chain
    m = dict(
        chains=C, burnin=burnin, kept=keep, num_leapfrog=L,
        adapt_step_size=True, geodesic="taylor", grad_backend="pallas",
        eta_bar_median=round(float(np.median(np.asarray(eta_bar))), 4),
        mean_accept=round(float(accept.mean()), 3),
        accept_per_chain_min=round(float(accept.mean(axis=0).min()), 3),
        divergent_epochs_total=int(divergent.sum()),
        rhat_max=round(float(rhat.max()), 4),
        rhat_median=round(float(np.median(rhat)), 4),
        rhat_max_function_space=round(float(rhat[:nfun].max()), 4),
        rhat_max_param_space=round(float(rhat[nfun:].max()), 4),
        ess_min=round(float(ess.min()), 1),
        ess_median=round(float(np.median(ess)), 1),
        ess_min_function_space=round(float(ess[:nfun].min()), 1),
        ess_min_param_space=round(float(ess[nfun:].min()), 1),
        seconds=round(wall, 1),
        leapfrogs_per_s=round(C * (burnin + keep) * L / wall, 1),
    )
    append_record(RECORDS, "gmc_multichain_diagnostics", m)
    print(m, flush=True)


if __name__ == "__main__":
    main()
