"""On-chip component breakdown of the merged GMC leapfrog (r5 ask #2).

SPEEDLIGHT r4 attributed the 2.6× leapfrog-to-roofline residual to
"LOO/elementwise work, H evaluations and manifold algebra" WITHOUT
component-level timing — the same asserted-not-measured pattern as the
retired r3 "lane ceiling" claim. This script times each component of the
merged leapfrog as its own jitted scan on the chip (data-dependent chaining
defeats CSE; repeat-count amortisation removes dispatch overhead):

- ``grad_pallas`` / ``grad_xla``: the fleet log-joint gradient (the leapfrog
  cost model says this should be ~all of it)
- ``logp``: one merged forward (the H evaluation — 2 per epoch, amortised
  over L leapfrogs)
- ``half_kick``: momentum half-step incl. lane-merged tangent projection
  (2 per leapfrog)
- ``geodesic``: Taylor geodesic position step with momentum transport
  (1 per leapfrog)

The composite model `grad + 2·half_kick + geodesic (+ (2·logp+grad)/L)` is
compared against the measured full leapfrog; the gap is the scan/select glue.
Writes RECORDS ``gmc_leapfrog_breakdown``.
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
from gpt_tpu.inference import GMCConfig
from gpt_tpu.inference.gmc import run_gmc_chains
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams
from gpt_tpu.ops.pallas_sgld import make_fused_grad_fn
from gpt_tpu.utils import stiefel
from gpt_tpu.utils.records import append_record

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def amortised_time(make_prog, reps_lo, reps_hi):
    """Seconds per rep via two-point amortisation (dispatch removed)."""
    lo = make_prog(reps_lo)
    hi = make_prog(reps_hi)
    jax.block_until_ready(lo())
    jax.block_until_ready(hi())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(lo())
        t1 = time.perf_counter()
        jax.block_until_ready(hi())
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (reps_hi - reps_lo))
    return best


def main():
    C, L = 16, 30
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

    model = TensorGP(n=P.n, r=P.r, D=D, I=I, signal_var=P.signal_var,
                     precision="highest", contraction="merged")
    params = jax.vmap(model.init_params)(jax.random.split(kp, C))
    grad_pallas = make_fused_grad_fn(model, phi, y, exact=True)
    grad_xla = jax.grad(
        lambda p: jnp.sum(model.log_lik(p, phi, y) + model.log_prior(p)))
    sqe = jnp.full((C,), jnp.sqrt(P.epsU), jnp.float32)
    tb = jnp.broadcast_to(sqe.reshape(C, 1), (C, D))
    mom0 = stiefel.project_tangent_fleet(
        params.U, jax.random.normal(ks, params.U.shape))

    def dep_tree(c, out):
        """Data dependence on EVERY leaf: without perturbing U too, XLA
        hoists the U-only matmuls (the expensive part of the gradient) out
        of the timing scan as loop invariants — measured 0.08 ms for a
        "gradient" that really ran once."""
        s = sum(jnp.sum(l) for l in jax.tree.leaves(out)) * 1e-30
        return jax.tree.map(lambda a: a + s.astype(a.dtype), c)

    def make(make_body, init):
        def build(reps):
            @jax.jit
            def prog():
                def body(c, _):
                    return make_body(c), ()
                out, _ = jax.lax.scan(body, init, None, length=reps)
                return jax.tree.leaves(out)[0]
            return prog
        return build

    comps = {}

    # gradient evals (the leapfrog's intended dominant cost)
    for name, gfn in (("grad_pallas", grad_pallas), ("grad_xla", grad_xla)):
        def body(c, gfn=gfn):
            return dep_tree(c, gfn(c))
        comps[name] = amortised_time(make(body, params), 20, 80)
        print(f"{name}: {comps[name]*1e3:.3f} ms", flush=True)

    # merged forward (H evaluation)
    def body_logp(c):
        lp = model.log_lik(c, phi, y) + model.log_prior(c)
        return dep_tree(c, (lp,))
    comps["logp"] = amortised_time(make(body_logp, params), 50, 200)
    print(f"logp: {comps['logp']*1e3:.3f} ms", flush=True)

    # half-kick: mom += sqe*g/2 then lane-merged tangent projection; the
    # gradient is held fixed (its cost is timed above) — carry (U, mom),
    # both perturbed so nothing hoists
    gU = grad_pallas(params).U

    def body_kick(c):
        U, mom = c
        m2 = mom + sqe.reshape(C, 1, 1, 1) * gU / 2
        m2 = stiefel.project_tangent_fleet(U, m2)
        return dep_tree((U, m2), (m2,))
    comps["half_kick"] = amortised_time(
        make(body_kick, (params.U, mom0)), 100, 400)
    print(f"half_kick: {comps['half_kick']*1e3:.3f} ms", flush=True)

    # Taylor geodesic with momentum transport (self-consistent iteration)
    def body_geod(c):
        U, mom = c
        U2, m2 = stiefel.geodesic_with_momentum(U, mom, tb, "taylor")
        return (U2, m2)
    comps["geodesic"] = amortised_time(
        make(body_geod, (params.U, mom0)), 100, 400)
    print(f"geodesic: {comps['geodesic']*1e3:.3f} ms", flush=True)

    # Euclidean w kick+drift (for completeness; expected negligible)
    def body_w(c):
        w2 = c.w + jnp.sqrt(P.epsw) * c.w * 1e-6
        return type(c)(w=w2, U=c.U)
    comps["w_update"] = amortised_time(make(body_w, params), 200, 800)
    print(f"w_update: {comps['w_update']*1e3:.3f} ms", flush=True)

    # measured full leapfrog (pallas grad, taylor geodesic)
    cfg = GMCConfig(eps=TensorGPParams(w=P.epsw, U=P.epsU), num_leapfrog=L,
                    geodesic_method="taylor")

    def build_full(epochs):
        fn = jax.jit(partial(
            run_gmc_chains, model, phi=phi, y=y, config=cfg,
            burnin=epochs, maxepoch=0, collect_fn=lambda p: (),
            grad_backend="pallas",
        ))
        def prog():
            return fn(params, ks)[0].w
        return prog
    t_epoch = amortised_time(build_full, 3, 9)
    t_leap = t_epoch / L
    print(f"full leapfrog (measured): {t_leap*1e3:.3f} ms", flush=True)

    model_sum = (comps["grad_pallas"] + 2 * comps["half_kick"]
                 + comps["geodesic"] + comps["w_update"]
                 + (2 * comps["logp"] + comps["grad_pallas"]) / L)
    fwd = 2 * N * D * P.n * P.r + N * D * P.Q + 2 * N * P.Q
    fstep = 3 * fwd
    m = {k: round(v * 1e3, 4) for k, v in comps.items()}
    m.update(
        full_leapfrog_ms=round(t_leap * 1e3, 4),
        component_sum_ms=round(model_sum * 1e3, 4),
        glue_residual_ms=round((t_leap - model_sum) * 1e3, 4),
        chains=C, L=L,
        leapfrogs_per_s_device=round(C / t_leap, 1),
        device_pct_f32_peak=round(
            100 * (C / t_leap) * fstep / 1e12 / 49.0, 2),
        note="per-FLEET times (C=16 chains advance together); "
             "model = grad + 2*half_kick + geodesic + w + (2*logp+grad)/L",
    )
    append_record(os.path.join(ROOT, "RECORDS.jsonl"),
                  "gmc_leapfrog_breakdown", m)
    print(m, flush=True)


if __name__ == "__main__":
    main()
