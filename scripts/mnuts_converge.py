"""Fleet-merged manifold NUTS → parameter-space convergence (r5 ask #1).

Drives the tensor-GP posterior (PP parity config) to rstan-report quality on
the SLOW subspace: the symmetry-invariant parameter-space probes (w_q²,
|U_dᵀv|) where the r4 GMC fleet sat at R̂ 1.24 / ESS 46 after 16 × 6,400
epochs × L=64 (RECORDS ``gmc_multichain_diagnostics``). Manifold NUTS mixes
those subspace-rotation directions best per draw (RECORDS
``manifold_nuts_vs_gmc``); the chain-merged fleet runner
(``run_manifold_nuts_chains``) makes its 2^max_depth-gradient draws
affordable — every tree leaf is ONE merged (N, n) @ (n, C·r) fleet gradient.

Probe battery IDENTICAL to ``scripts/gmc_diagnostics.py`` (function-space
predictions + w² + |U_dᵀv|), so the R̂/ESS rows compare directly. Targets
(VERDICT r5 #1): parameter-space R̂ max ≤ 1.05 (goal 1.01), ESS min ≥ 400.

Usage: mnuts_converge.py [C warmup keep max_depth] [--xla] [--smoke]
Segmented execution (the tunnelled chip kills dispatches past ~2 min):
warm segments restart dual averaging from the chained (params, step) —
documented drift-free because each restart anchors at the previous segment's
averaged step; sampling segments run frozen per-chain steps (detailed
balance exact per draw).

Reference comparison: the rstan gold standards report R̂ 1.00–1.01 / n_eff
in the hundreds (``temperature_uk/tensor2d_kron.r:42-43``) — on EUCLIDEAN
relaxations. This run holds the actual Stiefel tensor model to that bar.
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
from gpt_tpu.inference import SGLDConfig, run_sgld
from gpt_tpu.inference.manifold_nuts import run_manifold_nuts_chains
from gpt_tpu.inference.nuts import NUTSConfig
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams
from gpt_tpu.utils.records import append_record

RECORDS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "RECORDS.jsonl")


def main():
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    argv = [int(a) for a in sys.argv[1:] if not a.startswith("--")]
    C, warmup, keep, md = (argv + [16, 300, 900, 8][len(argv):])[:4]
    smoke = "--smoke" in flags
    grad_backend = "xla" if "--xla" in flags else "pallas"

    split = load_power_plant()
    key = jax.random.PRNGKey(23)  # same base key family as gmc_diagnostics
    kI, kf, kp, ks = jax.random.split(key, 4)
    n, r, Q = (8, 4, 16) if smoke else (P.n, P.r, P.Q)
    Xtr = split.X_train[:400] if smoke else split.X_train
    ytr = split.y_train[:400] if smoke else split.y_train
    D = Xtr.shape[1]
    I = sample_core_indices(kI, r, D, Q)
    rff = sample_tensor_rff(kf, n, D)
    scale = tensor_phi_scale(n, Q, D)
    phi = tensor_features(jnp.asarray(Xtr, jnp.float32), rff,
                          P.length_scale, P.sigma_RBF, scale)
    y = jnp.asarray(ytr, jnp.float32)
    phi_probe = tensor_features(jnp.asarray(split.X_test[:32], jnp.float32),
                                rff, P.length_scale, P.sigma_RBF, scale)

    model = TensorGP(n=n, r=r, D=D, I=I, signal_var=P.signal_var,
                     precision="highest", contraction="merged")
    vprobe = jax.random.normal(jax.random.fold_in(key, 99), (n,))
    vprobe = vprobe / jnp.linalg.norm(vprobe)

    def collect(p):
        preds = model.predict(p, phi_probe)                      # (C, 32)
        w2 = p.w[:, :32] ** 2                                    # (C, ≤32)
        align = jnp.abs(jnp.einsum("cdnr,n->cdr", p.U, vprobe))  # (C, D, r)
        align = align.reshape(p.w.shape[0], -1)[:, :32]
        return jnp.concatenate([preds, w2, align], axis=-1)

    nfun = 32

    # SGLD warm start (NUTS from random inits spends its budget in the prior)
    warm_cfg = SGLDConfig(eps=TensorGPParams(w=P.epsw, U=P.epsU), transport="polar")
    inits = jax.vmap(model.init_params)(jax.random.split(kp, C))
    warm, _ = run_sgld(model, inits, jax.random.fold_in(ks, 1), phi, y,
                       m=P.m, config=warm_cfg, burnin=30, maxepoch=0,
                       collect_fn=lambda p: ())
    params = warm.params

    eps = TensorGPParams(w=P.epsw, U=P.epsU)
    cfg = NUTSConfig(max_depth=md, init_step_size=1.0)

    # segment sizes scaled so one dispatch stays under ~40 s of device time
    # (a full-depth draw costs ~2^md merged gradients; the tunnelled chip
    # faults dispatches past ~2 min and occasionally faults shorter ones —
    # segments are retried once and the state is checkpointed to disk)
    SEGW = max(10, (50 * 256) >> md)
    SEG = SEGW
    ckpt_path = f"/tmp/mnuts_ckpt_C{C}_md{md}{'_smoke' if smoke else ''}.npz"

    warm_run = jax.jit(partial(
        run_manifold_nuts_chains, model, phi=phi, y=y, eps=eps,
        num_warmup=SEGW, num_samples=0, config=cfg,
        collect_fn=collect, grad_backend=grad_backend,
    ))
    seg_run = jax.jit(partial(
        run_manifold_nuts_chains, model, phi=phi, y=y, eps=eps,
        num_warmup=0, num_samples=SEG, config=cfg,
        collect_fn=collect, grad_backend=grad_backend,
    ))

    def retry(fn, *a, **k):
        """One retry on the tunnelled chip's transient device faults."""
        try:
            return fn(*a, **k)
        except Exception as e:  # jax.errors.JaxRuntimeError and friends
            print(f"segment faulted ({type(e).__name__}: {e}); retrying once",
                  flush=True)
            time.sleep(10)
            return fn(*a, **k)

    t_prev = 0.0

    def save_ckpt(tag, seg_idx, params, step, payload):
        np.savez(ckpt_path, tag=tag, seg=seg_idx,
                 w=np.asarray(params.w), U=np.asarray(params.U),
                 step=np.asarray(step),
                 secs=t_prev + (time.time() - t0), **payload)

    t0 = time.time()
    step = jnp.full((C,), jnp.float32(cfg.init_step_size))
    probes_segs, acc_segs, nlf_segs, div_segs = [], [], [], []
    warm_done, samp_done = 0, 0
    if "--resume" in flags and os.path.exists(ckpt_path):
        ck = np.load(ckpt_path, allow_pickle=False)
        params = TensorGPParams(w=jnp.asarray(ck["w"]), U=jnp.asarray(ck["U"]))
        step = jnp.asarray(ck["step"])
        t_prev = float(ck["secs"]) if "secs" in ck else 0.0
        if str(ck["tag"]) == "warm":
            warm_done = int(ck["seg"])
        else:
            warm_done = 10**9  # warmup finished
            samp_done = int(ck["seg"])
            probes_segs = [ck[f"pr{i}"] for i in range(samp_done)]
            acc_segs = [ck[f"ac{i}"] for i in range(samp_done)]
            nlf_segs = [ck[f"nl{i}"] for i in range(samp_done)]
            div_segs = [ck[f"dv{i}"] for i in range(samp_done)]
        print(f"resumed from {ckpt_path}: warm_done={min(warm_done, 10**6)} "
              f"samp_done={samp_done}", flush=True)

    nwarm = -(-warmup // SEGW)
    for b in range(warm_done if warm_done < 10**9 else nwarm, nwarm):
        kb = jax.random.fold_in(ks, 1000 + b)
        _, _, step, params = retry(warm_run, params, kb, step_size0=step)
        jax.block_until_ready(step)
        save_ckpt("warm", b + 1, params, step, {})
        print(f"warm seg {b+1}/{nwarm}: step median {float(jnp.median(step)):.4g} "
              f"[{float(jnp.min(step)):.3g}, {float(jnp.max(step)):.3g}] "
              f"t={time.time()-t0:.0f}s", flush=True)

    nseg = -(-keep // SEG)
    for s in range(samp_done, nseg):
        kseg = jax.random.fold_in(ks, 2000 + s)
        pr, stats, _, params = retry(seg_run, params, kseg, step_size0=step)
        jax.block_until_ready(pr)
        probes_segs.append(np.asarray(pr))
        acc_segs.append(np.asarray(stats["accept_stat"]))
        nlf_segs.append(np.asarray(stats["n_leapfrog"]))
        div_segs.append(np.asarray(stats["diverged"]))
        payload = {}
        for i in range(len(probes_segs)):
            payload[f"pr{i}"] = probes_segs[i]
            payload[f"ac{i}"] = acc_segs[i]
            payload[f"nl{i}"] = nlf_segs[i]
            payload[f"dv{i}"] = div_segs[i]
        save_ckpt("sample", s + 1, params, step, payload)
        print(f"sample seg {s+1}/{nseg}: acc {acc_segs[-1].mean():.3f} "
              f"n_lf mean {nlf_segs[-1].mean():.0f} t={time.time()-t0:.0f}s",
              flush=True)
    wall = t_prev + (time.time() - t0)

    probes = np.concatenate(probes_segs, axis=0)[:keep].transpose(1, 0, 2)
    acc = np.concatenate(acc_segs, axis=0)[:keep]
    nlf = np.concatenate(nlf_segs, axis=0)[:keep]
    div = np.concatenate(div_segs, axis=0)[:keep]

    rhat = np.asarray(potential_scale_reduction(jnp.asarray(probes)))
    ess = np.asarray(effective_sample_size(jnp.asarray(probes)))
    m = dict(
        chains=C, warmup=warmup, kept=int(probes.shape[1]), max_depth=md,
        grad_backend=grad_backend, geodesic="taylor",
        step_median=round(float(np.median(np.asarray(step))), 5),
        mean_accept=round(float(acc.mean()), 3),
        accept_per_chain_min=round(float(acc.mean(axis=0).min()), 3),
        divergent_draws_total=int(div.sum()),
        n_leapfrog_mean=round(float(nlf.mean()), 1),
        grads_total=int(nlf.sum()),
        rhat_max=round(float(rhat.max()), 4),
        rhat_median=round(float(np.median(rhat)), 4),
        rhat_max_function_space=round(float(rhat[:nfun].max()), 4),
        rhat_max_param_space=round(float(rhat[nfun:].max()), 4),
        ess_min=round(float(ess.min()), 1),
        ess_median=round(float(np.median(ess)), 1),
        ess_min_function_space=round(float(ess[:nfun].min()), 1),
        ess_min_param_space=round(float(ess[nfun:].min()), 1),
        seconds=round(wall, 1),
        chain_leapfrogs_per_s=round(C * float(nlf.mean()) * probes.shape[1] / wall, 1),
    )
    if smoke:
        m["smoke"] = True
    append_record(RECORDS, "manifold_nuts_fleet_diagnostics", m)
    print(m, flush=True)


if __name__ == "__main__":
    main()
