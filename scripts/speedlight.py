"""Speed-of-light report (BASELINE.json targets) → SPEEDLIGHT.md.

Three measurements on one chip:

1. headline tensor-GP SGLD (fused chains, polar transport) — chain-steps/s
   and achieved FLOP/s from XLA's own cost model;
2. GMC log-prob + leapfrog throughput on the PP parity config (full-batch,
   HIGHEST precision) — leapfrogs/s vs the reference's ~10 s per L=1 epoch
   (``DataRecords.txt:41``);
3. MovieLens-100k full-w side-info SGLD — chain-steps/s (the ≥50×
   samples/s target workload).

Achieved FLOP/s uses an ANALYTIC intrinsic-FLOP model of one transition
(formulas below, counting the algorithm's mul+adds — gathers/scatters at
zero) times the measured step count, divided by wall time; peaks quoted for
TPU v5e: ~197 TFLOP/s bf16, ~49 TFLOP/s f32. Earlier rounds divided
``compiled.cost_analysis()['flops']`` by the wall time of the whole run —
but XLA's HLO cost model counts a ``while``-loop body ONCE, so a 1250-step
scan was undercounted ~1250× (the r1/r2 "0.005% of peak" records are that
artifact, preserved in RECORDS.jsonl for provenance). The XLA per-step cost
is still reported as a cross-check where available (it's meaningless for
the megafused Pallas path, whose work lives inside one custom call).
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import dataclasses

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpt_tpu.data import load_movielens_100k, load_power_plant
from gpt_tpu.experiments import configs as CFG
from gpt_tpu.experiments.movielens import build_cf_model
from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.inference import GMCConfig, SGLDConfig, run_gmc, run_sgld
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.cf import CFParams, ratings_batch
from gpt_tpu.models.tensor_gp import TensorGPParams
from gpt_tpu.utils.records import append_record

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORDS = os.path.join(ROOT, "RECORDS.jsonl")
PEAK_BF16 = 197e12
PEAK_F32 = 49e12


def _flops(jitted, *args):
    try:
        comp = jitted.lower(*args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", float("nan")))
    except Exception:
        return float("nan")


def sgld_step_flops(m, n, r, Q, D):
    """Intrinsic FLOPs of ONE tensor-GP SGLD minibatch transition, per chain.

    phidot (2mnrD) + V products (2mQD) + fhat/gradw (4mQ) + leave-one-out
    backward (3mQD) + A scatter-accumulate (2mQD) + Psi/gradU (2mnrD) +
    Stiefel proj + Newton–Schulz polar retraction (~10nr^2 D) + w update (3Q).
    Core-index gathers are counted at zero (they are data movement): this is
    the bar a hand-tuned implementation would be judged against, not the
    padded/block-diagonal FLOPs any particular realisation spends.
    """
    return (
        4 * m * n * r * D
        + 7 * m * Q * D
        + 4 * m * Q
        + 10 * n * r * r * D
        + 3 * Q
    )


def gmc_leapfrog_flops(N, n, r, Q, D):
    """Intrinsic FLOPs of ONE GMC leapfrog, per chain (shared-endpoint
    gradients: one full-batch gradient + one forward per leapfrog)."""
    grad = 4 * N * n * r * D + 7 * N * Q * D + 4 * N * Q
    fwd = 2 * N * n * r * D + 2 * N * Q * D + 2 * N * Q
    manifold = 14 * n * r * r * D  # geodboth: proj + transport + retraction
    return grad + fwd + manifold


def cf_sgld_step_flops(m, r, nsideU, nsideV):
    """Intrinsic FLOPs of ONE CF full-w side-info SGLD step, per chain:
    per-rating side-info row sums, bilinear predict (2r^2 + 2r), gradients
    through w (kron, 3r^2) and the touched U/V rows, plus the w update."""
    per_rating = 2 * r * (nsideU + nsideV + 2) + 5 * r * r + 8 * r
    return m * per_rating + 5 * r * r


def _time(fn, *args, reps=2):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def headline_sgld(C=256, epochs=25):
    split = load_power_plant()
    P = CFG.POWER_PLANT_TENSOR_SMALL
    key = jax.random.PRNGKey(17)
    kI, kf, kp, ks = jax.random.split(key, 4)
    D = split.X_train.shape[1]
    I = sample_core_indices(kI, P.r, D, P.Q)
    phi = tensor_features(
        jnp.asarray(split.X_train, jnp.float32), sample_tensor_rff(kf, P.n, D),
        P.length_scale, P.sigma_RBF, tensor_phi_scale(P.n, P.Q, D),
    )
    y = jnp.asarray(split.y_train, jnp.float32)
    B = -(-y.shape[0] // P.m)
    model = TensorGP(n=P.n, r=P.r, D=D, I=I, signal_var=P.signal_var)
    cfg = SGLDConfig(eps=TensorGPParams(w=P.epsw, U=P.epsU), transport="polar")
    params0 = jax.vmap(model.init_params)(jax.random.split(kp, C))

    jitted = jax.jit(partial(
        run_sgld, model, phi=phi, y=y, m=P.m, config=cfg,
        burnin=epochs, maxepoch=0, collect_fn=lambda p: (),
    ))
    dt = _time(jitted, params0, ks)
    steps = C * B * epochs
    fstep = sgld_step_flops(P.m, P.n, P.r, P.Q, D)
    fl = fstep * steps
    return {
        "workload": f"tensor-GP SGLD (PP n=100 r=10 Q=100 m=100, {C} fused chains, polar)",
        "steps_per_s": steps / dt,
        "seconds": dt,
        "flops_per_step": fstep,
        "flops_total": fl,
        "achieved_tflops": fl / dt / 1e12,
        "pct_f32_peak": 100 * fl / dt / PEAK_F32,
        "pct_bf16_peak": 100 * fl / dt / PEAK_BF16,
    }


def headline_sgld_megafused(C=4096, epochs=25, CB=16, mc=50):
    from gpt_tpu.inference.sgld import collect_nothing, run_sgld_megafused

    split = load_power_plant()
    P = CFG.POWER_PLANT_TENSOR_SMALL
    key = jax.random.PRNGKey(17)
    kI, kf, kp, ks = jax.random.split(key, 4)
    D = split.X_train.shape[1]
    I = sample_core_indices(kI, P.r, D, P.Q)
    phi = tensor_features(
        jnp.asarray(split.X_train, jnp.float32), sample_tensor_rff(kf, P.n, D),
        P.length_scale, P.sigma_RBF, tensor_phi_scale(P.n, P.Q, D),
    )
    y = jnp.asarray(split.y_train, jnp.float32)
    B = -(-y.shape[0] // P.m)
    model = TensorGP(n=P.n, r=P.r, D=D, I=I, signal_var=P.signal_var)
    cfg = SGLDConfig(eps=TensorGPParams(w=P.epsw, U=P.epsU), transport="polar")
    params0 = jax.vmap(model.init_params)(jax.random.split(kp, C))

    def go():
        finals, _, _ = run_sgld_megafused(
            model, params0, ks, phi, y, m=P.m, config=cfg,
            burnin=epochs, maxepoch=0, collect_fn=collect_nothing,
            chain_block=CB, data_chunk=mc,
        )
        return finals.w

    dt = _time(go)
    steps = C * B * epochs
    fstep = sgld_step_flops(P.m, P.n, P.r, P.Q, D)
    fl = fstep * steps
    return {
        "workload": f"tensor-GP SGLD megafused Pallas (PP headline, {C} chains, CB={CB})",
        "steps_per_s": steps / dt,
        "seconds": dt,
        "flops_per_step": fstep,
        "flops_total": fl,
        "achieved_tflops": fl / dt / 1e12,
        "pct_f32_peak": 100 * fl / dt / PEAK_F32,
        "pct_bf16_peak": 100 * fl / dt / PEAK_BF16,
    }


def gmc_leapfrog(C=16, epochs=5, L=30):
    split = load_power_plant()
    P = CFG.POWER_PLANT_TENSOR
    key = jax.random.PRNGKey(17)
    kI, kf, kp, ks = jax.random.split(key, 4)
    D = split.X_train.shape[1]
    I = sample_core_indices(kI, P.r, D, P.Q)
    phi = tensor_features(
        jnp.asarray(split.X_train, jnp.float32), sample_tensor_rff(kf, P.n, D),
        P.length_scale, P.sigma_RBF, tensor_phi_scale(P.n, P.Q, D),
    )
    y = jnp.asarray(split.y_train, jnp.float32)
    model = TensorGP(n=P.n, r=P.r, D=D, I=I, signal_var=P.signal_var,
                     precision="highest")
    cfg = GMCConfig(eps=TensorGPParams(w=1e-4, U=1e-7), num_leapfrog=L)
    params0 = jax.vmap(model.init_params)(jax.random.split(kp, C))
    keys = jax.random.split(ks, C)

    jitted = jax.jit(jax.vmap(partial(
        run_gmc, model, phi=phi, y=y, config=cfg,
        burnin=epochs, maxepoch=0, collect_fn=lambda p: (),
    )))
    dt = _time(jitted, params0, keys)
    leapfrogs = C * epochs * L
    fstep = gmc_leapfrog_flops(y.shape[0], P.n, P.r, P.Q, D)
    fl = fstep * leapfrogs
    return {
        "workload": f"GMC leapfrog (PP n=150 r=20 Q=200, full batch N=5000, {C} chains, L={L})",
        "leapfrogs_per_s": leapfrogs / dt,
        "seconds": dt,
        "flops_per_leapfrog": fstep,
        "flops_total": fl,
        "achieved_tflops": fl / dt / 1e12,
        "pct_f32_peak": 100 * fl / dt / PEAK_F32,
        "pct_bf16_peak": 100 * fl / dt / PEAK_BF16,
        "reference_leapfrogs_per_s": 0.1,  # ~10 s per L=1 epoch, DataRecords.txt:41
    }


def gmc_leapfrog_fleet(C=16, epochs=5, L=30, exact=True):
    """Round-4 chain-merged fleet: Taylor geodesics + fused Pallas gradient.

    ``exact=True`` = f32-quality forces (3-pass dots — the MH-exact
    configuration); ``exact=False`` = bf16 forces (trajectory-quality only;
    the accept ratio is still exact but dual averaging must shrink steps, so
    use this rate for SGLD-like consumers). Full sweep incl. the measured
    bare-matmul roofline: RECORDS ``gmc_merged_lanes``
    (scripts/gmc_merged_bench.py).
    """
    from gpt_tpu.inference.gmc import run_gmc_chains

    split = load_power_plant()
    P = CFG.POWER_PLANT_TENSOR
    key = jax.random.PRNGKey(17)
    kI, kf, kp, ks = jax.random.split(key, 4)
    D = split.X_train.shape[1]
    I = sample_core_indices(kI, P.r, D, P.Q)
    phi = tensor_features(
        jnp.asarray(split.X_train, jnp.float32), sample_tensor_rff(kf, P.n, D),
        P.length_scale, P.sigma_RBF, tensor_phi_scale(P.n, P.Q, D),
    )
    y = jnp.asarray(split.y_train, jnp.float32)
    model = TensorGP(n=P.n, r=P.r, D=D, I=I, signal_var=P.signal_var,
                     precision="highest", contraction="merged")
    cfg = GMCConfig(eps=TensorGPParams(w=1e-4, U=1e-7), num_leapfrog=L,
                    geodesic_method="taylor")
    params0 = jax.vmap(model.init_params)(jax.random.split(kp, C))

    jitted = jax.jit(partial(
        run_gmc_chains, model, phi=phi, y=y, config=cfg,
        burnin=epochs, maxepoch=0, collect_fn=lambda p: (),
        grad_backend="pallas" if exact else "pallas_bf16",
    ))
    dt = _time(jitted, params0, ks)
    leapfrogs = C * epochs * L
    fstep = gmc_leapfrog_flops(y.shape[0], P.n, P.r, P.Q, D)
    fl = fstep * leapfrogs
    tag = "exact f32 forces" if exact else "bf16 forces"
    return {
        "workload": f"GMC leapfrog, r4 merged fleet ({tag}; {C} chains, L={L})",
        "leapfrogs_per_s": leapfrogs / dt,
        "seconds": dt,
        "flops_per_leapfrog": fstep,
        "achieved_tflops": fl / dt / 1e12,
        "pct_f32_peak": 100 * fl / dt / PEAK_F32,
        "measured_roofline_pct_f32_peak": 22.7,  # RECORDS gmc_merged_lanes
        "reference_leapfrogs_per_s": 0.1,
    }


def gmc_leapfrog_fleet_bf16():
    return gmc_leapfrog_fleet(exact=False)


def ml100k_sgld(C=64, epochs=5):
    fold = load_movielens_100k(1)
    preset = CFG.MOVIELENS_100K
    model = build_cf_model(fold, preset)
    key = jax.random.PRNGKey(17)
    kp, ks = jax.random.split(key)
    params0 = jax.vmap(lambda k: model.init_params(k))(jax.random.split(kp, C))
    train_batch, y_train = ratings_batch(jnp.asarray(fold.train, jnp.float32))
    cfg = SGLDConfig(eps=CFParams(U=preset.epsU, V=preset.epsU, w=preset.epsw))
    B = -(-y_train.shape[0] // preset.m)

    # fused chain batching (CFModel broadcasts over leading chain axes),
    # steady-state jit
    jitted = jax.jit(partial(
        run_sgld, model, phi=train_batch, y=y_train, m=preset.m, config=cfg,
        burnin=epochs, maxepoch=0, collect_fn=lambda q: (),
    ))
    dt = _time(jitted, params0, ks)
    steps = C * B * epochs
    fstep = cf_sgld_step_flops(preset.m, preset.r, 24, 19)
    return {
        "workload": f"ML-100k full-w side-info SGLD (80k ratings, m=100, {C} fused chains)",
        "steps_per_s": steps / dt,
        "seconds": dt,
        "flops_per_step": fstep,
        "achieved_tflops": fstep * steps / dt / 1e12,
        "reference_steps_per_s_proxy": 16.7,  # PP-epoch-derived CPU rate
    }


def main():
    lines = [
        "# SPEEDLIGHT — per-chip throughput vs hardware peak",
        "",
        f"Chip: {jax.devices()[0].device_kind}; peaks assumed 197 TF bf16 / 49 TF f32.",
        "FLOP counts are ANALYTIC intrinsic per-transition costs (see",
        "`scripts/speedlight.py` docstrings) times measured step counts —",
        "r1/r2 used `cost_analysis()`, which counts scan bodies once and so",
        "understated achieved FLOP/s by the ~1250-step trip count.",
        "",
    ]
    for fn in (headline_sgld, headline_sgld_megafused, gmc_leapfrog,
               gmc_leapfrog_fleet, gmc_leapfrog_fleet_bf16, ml100k_sgld):
        rep = fn()
        append_record(RECORDS, "speedlight", rep)
        lines.append(f"## {rep.pop('workload')}")
        lines.append("")
        for k, v in rep.items():
            lines.append(f"- {k}: {v:,.3f}" if isinstance(v, float) else f"- {k}: {v}")
        lines.append("")
        print(lines[-3], flush=True)
    lines += [
        "Interpretation: per-chain operands are tiny (m ≤ 100, n ≤ 150, r ≤ 20),",
        "so a single chain is latency-bound far below peak; throughput scales by",
        "batching chains until the MXU is fed (the headline fused-chain runs).",
        "",
        "The SGLD headline row above keeps HIGHEST-precision transport algebra",
        "for apples-to-apples history; `bench.py` additionally enables the",
        "SGLD-sanctioned DEFAULT-precision transport (Newton–Schulz correction",
        "stays HIGHEST) and a stable epsw=5e-5 — 700k chain-steps/s with zero",
        "rejections (BENCH_r04).",
        "",
        "GMC: the r3 claim that ~2.5% of f32 peak was a lane-utilisation",
        "ceiling is RETIRED. The r4 merged fleet (chain-merged lanes, Taylor",
        "geodesics replacing the scalar-bound batched Padé expm, and the",
        "folded-layout Pallas gradient) runs the exact-MH configuration 2.3×",
        "faster and the bf16-force configuration 3.7× faster, against a",
        "MEASURED bare-matmul roofline of 22.7% of f32 peak at the kernel's",
        "exact shapes (RECORDS `gmc_merged_lanes`) — the full leapfrog is",
        "within ~2.6× of that shape-bound; the remainder is the LOO/elementwise",
        "work, H evaluations and manifold algebra, not matmul starvation.",
        "",
    ]
    with open(os.path.join(ROOT, "SPEEDLIGHT.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote SPEEDLIGHT.md")


if __name__ == "__main__":
    main()
