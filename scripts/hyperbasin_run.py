"""Recover the GPstuff PP hyperparameter optimum by multi-restart f64 L-BFGS.

The reference found ℓ=[1.3978, 0.0028, 2.8966, 7.5565], σ²_RBF=0.8333,
σ²_noise=0.0195, NLML −2239.2 on the full whitened Power Plant set with
NLopt MMA on CPU f64 (``DataRecords.txt:837-840``,
``PowerPlantDataExperiment.jl:83-85``). The ℓ₂≈0.003 coordinate is a sharp,
separate basin that flat single-start inits never reach (round-1 landed at
NLML −171), and f32 Choleskys NaN there.

Strategy (all f64 on CPU, the regime the reference used; one full-data
NLML+gradient costs ~110 s on this 2-core host so the search is staged):
1. multi-restart L-BFGS on a 1000-point subsample (~0.2 s/eval) finds the
   SMOOTH basin. Crucially, the sharp ℓ₂≈0.003 basin does not exist at low
   data density — measured: at N=1000 the reference optimum evaluates to
   NLML +537 vs the smooth basin's +15 — so small subsamples can never find
   it; the sharp basin is an emergent large-N feature.
2. per-dimension sharp probes at N=5000: from the smooth optimum with ℓ_d
   set to 0.01, short L-BFGS per dimension d — the basin, where it exists,
   captures the descent;
3. a short full-data (N=9568) L-BFGS refine of the winner;
4. append the winning row to RECORDS.jsonl.

Run: python scripts/hyperbasin_run.py
"""
import os
import sys
import time

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpt_tpu.data.loaders import REFERENCE_ROOT, _load_dense
from gpt_tpu.inference.hyper import gp_nlml, optimize_hyperparams
from gpt_tpu.utils.math import whiten
from gpt_tpu.utils.records import append_record

LOG_LO, LOG_HI = -8.0, 5.0  # box bounds in log space (MMA was box-constrained)
REF = {
    "signal_var": 0.0195,
    "sigma_RBF2": 0.8333,
    "length_scales": [1.3978, 0.0028, 2.8966, 7.5565],
    "nlml": -2239.2,
}


def load_pp():
    data = _load_dense(
        os.path.join(REFERENCE_ROOT, "Folds5x2_pp.csv"), 5, sep=",", skip_header=1
    )
    X, y = data[:, :4], data[:, 4]
    Xw, _ = whiten(jnp.asarray(X, jnp.float64))
    yw, _ = whiten(jnp.asarray(y, jnp.float64)[:, None])
    return Xw, yw[:, 0]


def make_nlml(X, y):
    def nlml(h):
        # h = [signal_var, sigma_RBF2, ℓ1..ℓ4]; box-clip in log space keeps the
        # f64 Cholesky SPD across every restart trajectory
        h = jnp.exp(jnp.clip(jnp.log(h), LOG_LO, LOG_HI))
        return gp_nlml(X, y, h[0], h[1], h[2:])

    return nlml


def main():
    X, y = load_pp()
    D = X.shape[1]
    rng = np.random.default_rng(0)
    sub1 = rng.choice(X.shape[0], 1000, replace=False)
    sub2 = rng.choice(X.shape[0], 5000, replace=False)
    nlml_sub = make_nlml(X[sub1], y[sub1])
    nlml_mid = make_nlml(X[sub2], y[sub2])
    nlml_full = make_nlml(X, y)

    inits = [np.concatenate([[0.05, 1.0], np.ones(D)])]
    for d in range(D):  # probe a sharp basin in each dimension
        ls = np.ones(D)
        ls[d] = 0.005
        inits.append(np.concatenate([[0.05, 1.0], ls]))
    for _ in range(4):
        inits.append(
            np.concatenate([[0.05, 1.0], np.exp(rng.normal(0.0, 1.5, D))])
        )

    stage1 = []
    for i, h0 in enumerate(inits):
        t0 = time.time()
        res = optimize_hyperparams(nlml_sub, jnp.asarray(h0), max_steps=150)
        val = float(res.nlml)
        stage1.append((val, np.asarray(res.hyperparams)))
        print(
            f"restart {i}: init={np.round(h0, 4)} -> sub-NLML {val:.1f} "
            f"h={np.round(np.asarray(res.hyperparams), 4)} "
            f"({res.num_steps} steps, {time.time()-t0:.1f}s)",
            flush=True,
        )

    stage1 = [s for s in stage1 if np.isfinite(s[0])]
    stage1.sort(key=lambda s: s[0])
    h_smooth = stage1[0][1]
    # basin existence check at N=5000: the sharp reference point must already
    # beat the smooth optimum there for the probe stage to make sense
    ref_h = jnp.asarray(
        [REF["signal_var"], REF["sigma_RBF2"], *REF["length_scales"]]
    )
    v_ref = float(nlml_mid(ref_h))
    v_smooth = float(nlml_mid(jnp.asarray(h_smooth)))
    print(f"N=5000 check: NLML(ref)={v_ref:.1f} vs NLML(smooth)={v_smooth:.1f}",
          flush=True)

    # stage 2: per-dimension sharp probes at N=5000
    stage2 = []
    candidates = [("smooth", h_smooth)]
    for d in range(D):
        hp = h_smooth.copy()
        hp[2 + d] = 0.01
        candidates.append((f"sharp-d{d}", hp))
    for name, h0 in candidates:
        t0 = time.time()
        res = optimize_hyperparams(nlml_mid, jnp.asarray(h0), max_steps=15)
        val = float(res.nlml)
        print(
            f"probe {name}: N=5000 NLML {val:.2f} "
            f"h={np.round(np.asarray(res.hyperparams), 4)} "
            f"({res.num_steps} steps, {time.time()-t0:.1f}s)",
            flush=True,
        )
        if np.isfinite(val):
            stage2.append((val, np.asarray(res.hyperparams)))

    stage2.sort(key=lambda s: s[0])
    t0 = time.time()
    res = optimize_hyperparams(nlml_full, jnp.asarray(stage2[0][1]), max_steps=8)
    val, steps = float(res.nlml), int(res.num_steps)
    h = np.asarray(res.hyperparams)
    print(f"full refine: NLML {val:.2f} ({steps} steps, {time.time()-t0:.1f}s)",
          flush=True)
    h = np.exp(np.clip(np.log(h), LOG_LO, LOG_HI))
    print(f"BEST: NLML {val:.2f} vs reference {REF['nlml']}")
    print(f"  signal_var={h[0]:.4f} (ref {REF['signal_var']})")
    print(f"  sigma_RBF2={h[1]:.4f} (ref {REF['sigma_RBF2']})")
    print(f"  ls={np.round(h[2:], 4)} (ref {REF['length_scales']})")
    append_record(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "RECORDS.jsonl"),
        "pp_hyperlearning_exact_basin",
        {
            "init": "multi-restart (per-dim sharp + lognormal), f64 CPU, "
            f"{len(sub1)}-pt stage + {len(sub2)}-pt probes + full polish",
            "signal_var": float(h[0]),
            "sigma_RBF2": float(h[1]),
            "length_scales": [float(v) for v in h[2:]],
            "nlml": val,
            "steps": steps,
            "reference": REF,
        },
    )


if __name__ == "__main__":
    main()
