"""GMC leapfrog throughput: vmapped chains vs chain-MERGED lanes + roofline.

VERDICT r3 Weak #2/#5: the GMC full-batch gradient has MXU-tileable shapes —
(5000, 150) @ (150, 20) per dimension per chain — but the vmapped fleet runs
them as C·D batched matmuls whose r=20 output columns fill 20/128 of the MXU
lane axis. ``run_gmc_chains`` + ``TensorGP(contraction="merged")`` merges the
16-chain fleet into the lane axis ((5000, 150) @ (150, 320) per dimension,
identical FLOPs), which this script quantifies head-to-head.

Also measures the ROOFLINE bound: a bare HIGHEST-precision f32 matmul stream
at the kernel's exact merged shapes — the hardware ceiling for this
algorithm's dominant op — so SPEEDLIGHT.md's "% of peak" claim is backed by a
measured shape-bound, not an asserted one.

Writes RECORDS ``gmc_merged_lanes``.
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
from gpt_tpu.experiments.configs import POWER_PLANT_TENSOR as P
from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.inference import GMCConfig, run_gmc
from gpt_tpu.inference.gmc import run_gmc_chains
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams
from gpt_tpu.utils.records import append_record

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def time_best(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def leapfrog_flops(N, n, r, Q, D):
    """Intrinsic FLOPs per chain-leapfrog (matches scripts/speedlight.py)."""
    fwd = 2 * N * D * n * r + N * D * Q + 2 * N * Q
    bwd = 2 * fwd
    return fwd + bwd


def main():
    C, epochs, L = 16, 5, 30
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
    N = int(y.shape[0])
    cfg = GMCConfig(eps=TensorGPParams(w=P.epsw, U=P.epsU), num_leapfrog=L)
    fstep = leapfrog_flops(N, P.n, P.r, P.Q, D)
    total_lf = C * epochs * L

    results = {}

    def report(name, dt):
        lps = total_lf / dt
        tf = lps * fstep / 1e12
        results[name] = dict(
            leapfrogs_per_s=round(lps, 1),
            achieved_tflops=round(tf, 3),
            pct_f32_peak=round(100 * tf / 49.0, 2),
        )
        print(f"{name}: {lps:,.0f} leapfrogs/s, {tf:.2f} TF/s "
              f"({100 * tf / 49.0:.1f}% f32 peak)", flush=True)

    # 1. status quo: vmapped per-chain gradients (batched tiny-lane matmuls)
    model_v = TensorGP(n=P.n, r=P.r, D=D, I=I, signal_var=P.signal_var,
                       precision="highest")
    params0 = jax.vmap(model_v.init_params)(jax.random.split(kp, C))
    keys = jax.random.split(ks, C)
    run_v = jax.jit(jax.vmap(partial(
        run_gmc, model_v, phi=phi, y=y, config=cfg,
        burnin=epochs, maxepoch=0, collect_fn=lambda p: (),
    )))
    dt, _ = time_best(lambda p, k: run_v(p, k)[0].w, params0, keys)
    report("vmap", dt)

    # 2. chain-merged lanes (gather/onehot expansion), then the two r4
    #    bottleneck fixes: matmul-only Taylor geodesics (the batched Padé
    #    expm costs as much as the whole gradient) and the fused Pallas
    #    chunk-streaming gradient (the XLA merged grad is HBM-bound on its
    #    (N, C, Q) intermediates)
    import dataclasses as dc

    variants = [
        ("merged", dict(contraction="merged"), cfg, "xla"),
        ("merged_onehot", dict(contraction="merged_onehot"), cfg, "xla"),
        ("merged+taylor", dict(contraction="merged"),
         dc.replace(cfg, geodesic_method="taylor"), "xla"),
        ("merged+taylor+pallas_grad", dict(contraction="merged"),
         dc.replace(cfg, geodesic_method="taylor"), "pallas"),
        ("merged+taylor+pallas_grad_bf16", dict(contraction="merged"),
         dc.replace(cfg, geodesic_method="taylor"), "pallas_bf16"),
    ]
    for name, mkw, vcfg, backend in variants:
        model_m = TensorGP(n=P.n, r=P.r, D=D, I=I, signal_var=P.signal_var,
                           precision="highest", **mkw)
        run_m = jax.jit(partial(
            run_gmc_chains, model_m, phi=phi, y=y, config=vcfg,
            burnin=epochs, maxepoch=0, collect_fn=lambda p: (),
            grad_backend=backend,
        ))
        dt, _ = time_best(lambda p, k: run_m(p, k)[0].w, params0, ks)
        report(name, dt)

    # 3. roofline: bare matmul stream at the merged kernel's exact shapes.
    # One leapfrog's MXU work per fleet = D fwd (N,n)@(n,C·r) + 2·D transposed
    # matmuls in the backward. Stream 3·D·L·epochs of the fwd shape.
    Cr = C * P.r
    A = jax.random.normal(jax.random.fold_in(key, 7), (N, P.n), jnp.float32)
    B = jax.random.normal(jax.random.fold_in(key, 8), (P.n, Cr), jnp.float32)
    reps_mm = 3 * D * L * epochs

    @jax.jit
    def matmul_stream(A, B):
        def body(acc, _):
            # data-dependent chain (B update) defeats CSE; one matmul per iter
            out = jax.lax.dot(A, B + acc[0, :Cr][None, :] * 1e-20,
                              precision=jax.lax.Precision.HIGHEST)
            return out, ()
        acc0 = jnp.zeros((N, Cr), jnp.float32)
        final, _ = jax.lax.scan(body, acc0, None, length=reps_mm)
        return final

    dt_mm, _ = time_best(matmul_stream, A, B)
    mm_flops = reps_mm * 2 * N * P.n * Cr
    mm_tf = mm_flops / dt_mm / 1e12
    results["roofline_matmul"] = dict(
        shape=f"({N},{P.n})@({P.n},{Cr}) f32 HIGHEST x{reps_mm}",
        achieved_tflops=round(mm_tf, 3),
        pct_f32_peak=round(100 * mm_tf / 49.0, 2),
        # the bound this stream implies for the full leapfrog, if matmuls
        # were the only cost (intrinsic matmul fraction of fstep):
        matmul_fraction=round(3 * D * 2 * N * P.n * P.r / fstep, 3),
        implied_leapfrog_bound_per_s=round(
            C * mm_tf * 1e12 / (3 * D * 2 * N * P.n * P.r * C), 1),
    )
    print(f"roofline matmul: {mm_tf:.2f} TF/s ({100 * mm_tf / 49.0:.1f}% f32 peak); "
          f"leapfrog bound {results['roofline_matmul']['implied_leapfrog_bound_per_s']:,.0f}/s/chain-fleet",
          flush=True)

    best = max((n for n, *_ in variants),
               key=lambda k: results[k]["leapfrogs_per_s"])
    results["speedup_vs_vmap"] = round(
        results[best]["leapfrogs_per_s"] / results["vmap"]["leapfrogs_per_s"], 2)
    results["best_mode"] = best
    append_record(os.path.join(ROOT, "RECORDS.jsonl"), "gmc_merged_lanes", results)
    print({k: v for k, v in results.items() if not isinstance(v, dict)})


if __name__ == "__main__":
    main()
