"""Measured bound for the megafused SGLD step (r5 ask #8).

SCALING_chains.md's "lane-utilisation tax" paragraph asserted the SGLD
kernel is elementwise-bound without a measured number — "3% of MXU peak
says nothing about distance from the true limit" (VERDICT r5 weak #4).
This script measures the kernel's ACTUAL resource ceilings at its exact
shapes (PP headline: n=100, r=10, Q=100, mc=50, CB=16):

- ``mxu_expand``: bf16 matmul stream at the block-one-hot expansion shape
  (mc, CB·r) @ (CB·r, CB·Q) — the kernel's dominant matmul, which spends
  CB× the intrinsic FLOPs by design (single-pass MXU beats the
  dispatch/relayout storm it replaces);
- ``mxu_phiU``: bf16 stream at the (mc, n) @ (n, CB·r) feature matmul;
- ``mxu_manifold``: f32 HIGHEST stream at the (n, CB·r) @ (CB·r, CB·r)
  manifold-algebra shape;
- ``vpu``: f32 elementwise multiply-add stream at (mc, CB·Q) — the LOO/
  scrub/product tensors' shape.

From these and the kernel's per-step op counts it computes two bounds on
chain-steps/s (serial = sum of resource times; overlap = max) and compares
with the measured megafused rate at 4096 chains. Writes RECORDS
``sgld_step_bound``.
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
from gpt_tpu.experiments.configs import POWER_PLANT_TENSOR_SMALL as PRESET
from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.inference import SGLDConfig
from gpt_tpu.inference.sgld import collect_nothing, run_sgld_megafused
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams
from gpt_tpu.utils.records import append_record

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def stream_time(make_body, init, reps_lo=5000, reps_hi=20000):
    """Per-rep seconds via two-point amortisation inside one jit."""
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
    n, r, Q, m = PRESET.n, PRESET.r, PRESET.Q, PRESET.m
    CB, mc = 16, 50
    CBr, CBQ = CB * r, CB * Q
    D = 4
    key = jax.random.PRNGKey(5)

    res = {}

    # --- MXU streams at the kernel's exact shapes ------------------------
    A1 = jax.random.normal(key, (mc, CBr), jnp.bfloat16)
    B1 = jax.random.normal(key, (CBr, CBQ), jnp.bfloat16)
    t = stream_time(lambda c: jax.lax.dot(
        A1 + c[0, :CBr][None, :].astype(jnp.bfloat16) * 0, B1,
        preferred_element_type=jnp.float32), jnp.zeros((mc, CBQ)))
    res["mxu_expand"] = dict(
        shape=f"({mc},{CBr})@({CBr},{CBQ}) bf16", seconds=t,
        tflops=round(2 * mc * CBr * CBQ / t / 1e12, 3))

    A2 = jax.random.normal(key, (mc, n), jnp.bfloat16)
    B2 = jax.random.normal(key, (n, CBr), jnp.bfloat16)
    t = stream_time(lambda c: jax.lax.dot(
        A2 + c[0, :n][None, :].astype(jnp.bfloat16) * 0, B2,
        preferred_element_type=jnp.float32), jnp.zeros((mc, CBr)))
    res["mxu_phiU"] = dict(
        shape=f"({mc},{n})@({n},{CBr}) bf16", seconds=t,
        tflops=round(2 * mc * n * CBr / t / 1e12, 3))

    A3 = jax.random.normal(key, (n, CBr), jnp.float32)
    B3 = jax.random.normal(key, (CBr, CBr), jnp.float32)
    t = stream_time(lambda c: jax.lax.dot(
        A3 + c[0, :CBr][None, :] * 1e-30, B3,
        precision=jax.lax.Precision.HIGHEST), jnp.zeros((n, CBr)))
    res["mxu_manifold"] = dict(
        shape=f"({n},{CBr})@({CBr},{CBr}) f32 HIGHEST", seconds=t,
        tflops=round(2 * n * CBr * CBr / t / 1e12, 3))

    # --- VPU stream at the (mc, CBQ) elementwise shape -------------------
    X = jax.random.normal(key, (mc, CBQ), jnp.float32)
    t = stream_time(lambda c: c * X + 1.000001, X)
    res["vpu_fma"] = dict(
        shape=f"({mc},{CBQ}) f32 multiply-add", seconds=t,
        gelem_per_s=round(mc * CBQ / t / 1e9, 2))

    for k, v in res.items():
        print(k, v, flush=True)

    # --- kernel per-step resource budget (per CB-block) ------------------
    Mch = m // mc
    # matmul seconds: count each matmul class at its measured stream rate
    t_expand = Mch * 2 * D * res["mxu_expand"]["seconds"]      # fwd + bwd
    t_phiU = Mch * 2 * D * res["mxu_phiU"]["seconds"]          # fwd + bwd
    # reductions (fhat, gbar_lane, ok masks) ~ 4 matmuls of (mc,CBQ)@(CBQ,CB)
    # per chunk — same A-shape as expand with CB-wide B: scale by CB/CBQ... tiny
    t_reduce = Mch * 4 * res["mxu_expand"]["seconds"] * CB / CBQ
    # manifold algebra: per step per d ~ 4 matmuls at the manifold shape
    t_manifold = 4 * D * res["mxu_manifold"]["seconds"]
    # elementwise (mc, CBQ)-class ops per chunk: V products (D-1), scrubs ~6,
    # suffix (D-2) + loo (D) + gdbar (D) in the backward, update ~4 at step end
    n_ew = Mch * (3 * D + 4) + 4
    t_vpu = n_ew * res["vpu_fma"]["seconds"]
    t_serial = t_expand + t_phiU + t_reduce + t_manifold + t_vpu
    t_mxu = t_expand + t_phiU + t_reduce + t_manifold
    bound_serial = CB / t_serial
    bound_overlap = CB / max(t_mxu, t_vpu)

    # --- measured megafused rate at 4096 chains --------------------------
    split = load_power_plant()
    kI, kf, kp, ks = jax.random.split(jax.random.PRNGKey(17), 4)
    I = sample_core_indices(kI, r, D, Q)
    rff = sample_tensor_rff(kf, n, D)
    phi = tensor_features(jnp.asarray(split.X_train, jnp.float32), rff,
                          PRESET.length_scale, PRESET.sigma_RBF,
                          tensor_phi_scale(n, Q, D))
    y = jnp.asarray(split.y_train, jnp.float32)
    model = TensorGP(n=n, r=r, D=D, I=I, signal_var=PRESET.signal_var)
    C = 4096
    params0 = jax.vmap(model.init_params)(jax.random.split(kp, C))
    cfg = SGLDConfig(eps=TensorGPParams(w=5e-5, U=PRESET.epsU),
                     transport="polar")
    epochs = 5
    num_batches = -(-int(y.shape[0]) // m)
    run = jax.jit(partial(
        run_sgld_megafused, model, phi=phi, y=y, m=m, config=cfg,
        burnin=epochs, maxepoch=0, collect_fn=collect_nothing,
        chain_block=CB, data_chunk=mc,
    ))
    jax.block_until_ready(run(params0, ks)[0].w)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(params0, ks)
        jax.block_until_ready(out[0].w)
        best = min(best, time.perf_counter() - t0)
    measured = C * num_batches * epochs / best

    rec = dict(
        shapes=dict(n=n, r=r, Q=Q, mc=mc, CB=CB, D=D, Mch=Mch),
        streams={k: v for k, v in res.items()},
        per_block_step_budget_us=dict(
            expand=round(t_expand * 1e6, 2), phiU=round(t_phiU * 1e6, 2),
            reduce=round(t_reduce * 1e6, 2),
            manifold=round(t_manifold * 1e6, 2), vpu=round(t_vpu * 1e6, 2),
        ),
        bound_serial_chain_steps_per_s=round(bound_serial, 1),
        bound_overlap_chain_steps_per_s=round(bound_overlap, 1),
        measured_chain_steps_per_s=round(measured, 1),
        measured_over_serial_bound=round(measured / bound_serial, 3),
        measured_over_overlap_bound=round(measured / bound_overlap, 3),
        n_elementwise_CBQ_ops=n_ew,
        chains_measured=C,
    )
    append_record(os.path.join(ROOT, "RECORDS.jsonl"), "sgld_step_bound", rec)
    print({k: v for k, v in rec.items() if k != "streams"}, flush=True)


if __name__ == "__main__":
    main()
