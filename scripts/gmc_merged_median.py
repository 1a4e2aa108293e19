"""gmc_merged_lanes as a MEASUREMENT: median-of-N, dispersion, dispatch split.

VERDICT r5 #3: the r4 `gmc_merged_lanes` rows quoted near-best single-shot
timings whose same-mode spread across runs was 2.7× (4,693 → 12,468
leapfrogs/s for merged+taylor+pallas_grad) with axon dispatch jitter the
suspected but unseparated cause. This script makes the number a measurement:

- every mode is re-run ``R`` times INTERLEAVED (round-robin, so slow phases
  of the tunnel hit all modes equally), reporting median + IQR;
- device time is separated from per-dispatch overhead by two-point repeat
  amortisation: the same jitted program is timed at ``epochs`` and
  ``3·epochs``; the slope ``(t3 − t1)/2`` is pure device+stream time for
  ``epochs`` worth of work, the intercept is dispatch/tunnel overhead.

Writes RECORDS ``gmc_merged_lanes_median`` (supersedes the single-shot
``gmc_merged_lanes`` rows, which are annotated as such).
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

import dataclasses as dc

import jax.numpy as jnp
import numpy as np

from gpt_tpu.data import load_power_plant
from gpt_tpu.experiments.configs import POWER_PLANT_TENSOR as P
from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.inference import GMCConfig
from gpt_tpu.inference.gmc import run_gmc_chains
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams
from gpt_tpu.utils.records import append_record

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def leapfrog_flops(N, n, r, Q, D):
    fwd = 2 * N * D * n * r + N * D * Q + 2 * N * Q
    return 3 * fwd


def main():
    C, epochs, L, R = 16, 5, 30, 7
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
    fstep = leapfrog_flops(N, P.n, P.r, P.Q, D)
    cfg = GMCConfig(eps=TensorGPParams(w=P.epsw, U=P.epsU), num_leapfrog=L,
                    geodesic_method="taylor")

    model = TensorGP(n=P.n, r=P.r, D=D, I=I, signal_var=P.signal_var,
                     precision="highest", contraction="merged")
    params0 = jax.vmap(model.init_params)(jax.random.split(kp, C))

    modes = {
        "merged+taylor": "xla",
        "merged+taylor+pallas_grad": "pallas",
        "merged+taylor+pallas_grad_bf16": "pallas_bf16",
    }
    # two programs per mode: epochs and 3*epochs (for the dispatch split)
    progs = {}
    for name, backend in modes.items():
        for mult in (1, 3):
            progs[(name, mult)] = jax.jit(partial(
                run_gmc_chains, model, phi=phi, y=y, config=cfg,
                burnin=epochs * mult, maxepoch=0, collect_fn=lambda p: (),
                grad_backend=backend,
            ))

    # compile everything up front (one warm call per program)
    for (name, mult), fn in progs.items():
        jax.block_until_ready(fn(params0, ks)[0].w)
        print(f"compiled {name} x{mult}", flush=True)

    # interleaved timing rounds
    times = {k: [] for k in progs}
    for rep in range(R):
        for (name, mult), fn in progs.items():
            t0 = time.perf_counter()
            out = fn(params0, jax.random.fold_in(ks, rep))
            jax.block_until_ready(out[0].w)
            times[(name, mult)].append(time.perf_counter() - t0)
        print(f"round {rep + 1}/{R} done", flush=True)

    results = {}
    for name in modes:
        t1 = np.array(times[(name, 1)])
        t3 = np.array(times[(name, 3)])
        lf1 = C * epochs * L
        # raw per-dispatch rate at the 1x program (includes overhead)
        rate_raw = lf1 / t1
        # device slope: work for 2x epochs / (t3 - t1), pairwise per round
        slope = (t3 - t1) / 2.0                     # seconds per epochs-batch
        rate_dev = lf1 / slope
        q = lambda a: (float(np.median(a)),
                       float(np.percentile(a, 25)), float(np.percentile(a, 75)))
        med_raw, lo_raw, hi_raw = q(rate_raw)
        med_dev, lo_dev, hi_dev = q(rate_dev)
        overhead = np.median(t1 - slope)            # per-dispatch fixed cost
        tf = med_dev * fstep / 1e12
        results[name] = dict(
            leapfrogs_per_s_median=round(med_raw, 1),
            leapfrogs_per_s_iqr=[round(lo_raw, 1), round(hi_raw, 1)],
            device_leapfrogs_per_s_median=round(med_dev, 1),
            device_leapfrogs_per_s_iqr=[round(lo_dev, 1), round(hi_dev, 1)],
            dispatch_overhead_s_median=round(float(overhead), 4),
            device_achieved_tflops=round(tf, 3),
            device_pct_f32_peak=round(100 * tf / 49.0, 2),
            spread_pct=round(100 * (hi_raw - lo_raw) / med_raw, 1),
            n_rounds=R,
        )
        print(name, results[name], flush=True)

    append_record(os.path.join(ROOT, "RECORDS.jsonl"),
                  "gmc_merged_lanes_median", results)


if __name__ == "__main__":
    main()
