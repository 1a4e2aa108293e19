"""Measured resource bounds for the two-stage fleet gradient kernel (r5).

Ask #2's done criterion (alternative branch): a component table proving each
residual term of the GMC leapfrog is within ~1.3× of its OWN measured bound.
RECORDS ``gmc_leapfrog_breakdown`` shows the gradient kernel is ~85-90% of
the leapfrog; this script measures the kernel's resource ceilings at its
exact pass inventory (CB=4, mc=250 — the shipped defaults):

- bf16 matmul streams at the kernel's four matmul shapes (3-pass temp,
  2-pass expansion, and their backward mirrors);
- a HIGHEST f32 stream at the (mc, CBQ) @ (CBQ, CB) reduction shape;
- a VPU f32 multiply-add stream at the (mc, CBQ) elementwise shape.

It assembles serial (sum) and overlap (max) bounds for one full fleet
gradient evaluation and compares against the measured kernel time.
Writes RECORDS ``gmc_grad_kernel_bound``.
"""
import os
import sys
import time

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
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.ops.pallas_sgld import make_fused_grad_fn
from gpt_tpu.utils.records import append_record

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def stream_time(make_body, init, reps_lo=5000, reps_hi=20000, rounds=3):
    def build(reps):
        @jax.jit
        def prog():
            def body(c, _):
                return make_body(c), ()
            out, _ = jax.lax.scan(body, init, None, length=reps)
            return jax.tree.leaves(out)[0]
        return prog
    lo, hi = build(reps_lo), build(reps_hi)
    jax.block_until_ready(lo())
    jax.block_until_ready(hi())
    ests = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        jax.block_until_ready(lo())
        t1 = time.perf_counter()
        jax.block_until_ready(hi())
        t2 = time.perf_counter()
        ests.append(((t2 - t1) - (t1 - t0)) / (reps_hi - reps_lo))
    return float(np.median(ests))


def mm_stream(key, M, K, N):
    """Per-pass seconds for a dependent bf16 (M,K)@(K,N) stream."""
    A = jax.random.normal(key, (M, K), jnp.bfloat16)
    B = jax.random.normal(key, (K, N), jnp.bfloat16)

    def body(c):
        out = jax.lax.dot(
            A + c[:1, :1].astype(jnp.bfloat16) * 0, B,
            preferred_element_type=jnp.float32)
        return out
    return stream_time(body, jnp.zeros((M, N), jnp.float32))


def main():
    C, CB, mc = 16, 4, 250
    n, r, Q, D = P.n, P.r, P.Q, 4
    CBr, CBQ = CB * r, CB * Q
    NB = C // CB
    N = 5000
    Mch = N // mc
    key = jax.random.PRNGKey(3)

    res = {}
    # matmul streams at the kernel's shapes (per single bf16 pass)
    res["mm_temp"] = mm_stream(key, mc, n, CBr)            # (250,150)@(150,80)
    res["mm_expand"] = mm_stream(key, mc, CBr, CBQ)        # (250,80)@(80,800)
    res["mm_expand_T"] = mm_stream(key, mc, CBQ, CBr)      # (250,800)@(800,80)
    res["mm_bwd_acc"] = mm_stream(key, n, mc, CBr)         # phi^T @ tempbar
    # VPU elementwise at the working shape
    X = jax.random.normal(key, (mc, CBQ), jnp.float32)
    res["vpu_fma"] = stream_time(lambda c: c * X + 1.000001, X,
                                 reps_lo=2000, reps_hi=8000)
    for k, v in res.items():
        print(f"{k}: {v*1e6:.2f} us/pass", flush=True)

    # pass inventory per fleet gradient eval (exact mode):
    # per (block, chunk, d): 3x temp + 2x expand (fwd) + 2x expand_T +
    # 3x bwd_acc (bwd)
    blocks = NB * Mch * D
    t_mm = blocks * (3 * res["mm_temp"] + 2 * res["mm_expand"]
                     + 2 * res["mm_expand_T"] + 3 * res["mm_bwd_acc"])
    # elementwise (mc, CBQ)-class ops per (block, chunk): V products (D-1) +
    # Vw + scrubs ~4 + sufs (D-2) + loo ~D + gdbar D + hi/lo splits ~2D
    n_ew = NB * Mch * (5 * D + 3)
    t_ew = n_ew * res["vpu_fma"]
    t_serial = t_mm + t_ew
    t_overlap = max(t_mm, t_ew)

    # measured kernel eval at the same config
    split = load_power_plant()
    kI, kf, kp, ks = jax.random.split(jax.random.PRNGKey(23), 4)
    Dd = split.X_train.shape[1]
    I = sample_core_indices(kI, r, Dd, Q)
    rff = sample_tensor_rff(kf, n, Dd)
    phi = tensor_features(jnp.asarray(split.X_train, jnp.float32), rff,
                          P.length_scale, P.sigma_RBF,
                          tensor_phi_scale(n, Q, Dd))
    y = jnp.asarray(split.y_train, jnp.float32)
    model = TensorGP(n=n, r=r, D=Dd, I=I, signal_var=P.signal_var,
                     precision="highest", contraction="merged")
    params = jax.vmap(model.init_params)(jax.random.split(kp, C))
    gfn = make_fused_grad_fn(model, phi, y, exact=True,
                             chain_block=CB, data_chunk=mc)

    def dep_tree(c, out):
        s = sum(jnp.sum(l) for l in jax.tree.leaves(out)) * 1e-30
        return jax.tree.map(lambda a: a + s.astype(a.dtype), c)

    t_meas = stream_time(lambda c: dep_tree(c, gfn(c)), params,
                         reps_lo=50, reps_hi=200, rounds=5)
    assert all(v > 0 for v in res.values()), (
        f"stream timing noise-dominated: {res}")

    rec = dict(
        config=dict(C=C, CB=CB, mc=mc, n=n, r=r, Q=Q, D=Dd, N=N),
        streams_us_per_pass={k: round(v * 1e6, 2) for k, v in res.items()},
        bound_matmul_ms=round(t_mm * 1e3, 4),
        bound_vpu_ms=round(t_ew * 1e3, 4),
        bound_serial_ms=round(t_serial * 1e3, 4),
        bound_overlap_ms=round(t_overlap * 1e3, 4),
        measured_kernel_ms=round(t_meas * 1e3, 4),
        measured_over_serial=round(t_meas / t_serial, 3),
        measured_over_overlap=round(t_meas / t_overlap, 3),
        note="bounds from bare dependent streams at the kernel's exact pass "
             "inventory; serial = sum of resource times, overlap = max",
    )
    append_record(os.path.join(ROOT, "RECORDS.jsonl"),
                  "gmc_grad_kernel_bound", rec)
    print(rec, flush=True)


if __name__ == "__main__":
    main()
