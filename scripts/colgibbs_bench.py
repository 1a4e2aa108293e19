"""Column-wise Gibbs sweep throughput: scan-ified vs round-1 Python loop.

VERDICT round-1 weak #5 / next-round #7: the column-wise Gibbs sweep
(``inf.R:94-161`` capability) rebuilt ALL tables — a full ``phidot`` forward —
for every one of D·r columns. At the kin40k config (n=150, r=20, D=8 →
160 columns) that is 160 forwards per sweep. The round-2 sweep keeps the
(N, D, r) inner-product tables as incremental scan state (one matvec refresh
per column) and computes the leave-k-out product once per factor block.

This script times both at the kin40k config (N=10000 train rows) and appends
the speedup to RECORDS.jsonl. The naive loop is re-implemented here verbatim
from the round-1 code so the comparison survives the refactor.
"""
from __future__ import annotations

import math
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

from gpt_tpu.inference.gibbs import (
    GibbsConfig,
    _mvn_from_precision,
    gibbs_sweep_columnwise,
    init_gibbs_params,
)
from gpt_tpu.models.tensor_gp import TensorGP, sample_core_indices
from gpt_tpu.ops.contraction import leave_one_out_products, phidot
from gpt_tpu.utils.records import append_record

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def naive_columnwise_sweep(model, params, key, phi, y, config):
    """The round-1 implementation: full table rebuild per column."""
    D, n, r, Q = model.D, model.n, model.r, model.Q
    I = model.I
    sigma_w = config.sigma_w if config.sigma_w is not None else math.sqrt(r**D / Q)
    sigma_u = config.sigma_u if config.sigma_u is not None else math.sqrt(1.0 / r)
    sv = model.signal_var
    eye_q = jnp.eye(Q, dtype=phi.dtype)
    eye_n = jnp.eye(n, dtype=phi.dtype)
    key_w, key_u = jax.random.split(key)
    U = params.U

    def tables(U):
        temp = phidot(phi, U)
        idx = jnp.broadcast_to(I.T.astype(jnp.int32), temp.shape[:-1] + (Q,))
        return jnp.take_along_axis(temp, idx, axis=-1)

    g = tables(U)
    V = jnp.prod(g, axis=1)
    prec_w = V.T @ V / sv + eye_q / sigma_w**2
    w = _mvn_from_precision(key_w, prec_w, V.T @ y / sv)

    keys = jax.random.split(key_u, D * r)
    for k in range(D):
        for l in range(r):
            g = tables(U)
            V = jnp.prod(g, axis=1)
            in_l = (I[:, k] == l).astype(phi.dtype)
            loo = leave_one_out_products(g, axis=1)[:, k, :]
            a_l = loo @ (w * in_l)
            rest = V @ (w * (1.0 - in_l))
            feats = a_l[:, None] * phi[:, k, :]
            prec = feats.T @ feats / sv + (1.0 / sigma_u**2 + config.jitter) * eye_n
            rhs = feats.T @ (y - rest) / sv
            u_l = _mvn_from_precision(keys[k * r + l], prec, rhs)
            U = U.at[k, :, l].set(u_l)
    from gpt_tpu.models.tensor_gp import TensorGPParams

    return TensorGPParams(w=w, U=U)


def main():
    N, n, r, D, Q = 10000, 150, 20, 8, 200  # kin40kExperiment.jl:38-52 config
    key = jax.random.PRNGKey(3)
    kI, kphi, ky, kp, ks = jax.random.split(key, 5)
    I = sample_core_indices(kI, r, D, Q)
    model = TensorGP(n=n, r=r, D=D, I=I, signal_var=0.05)
    phi = jax.random.normal(kphi, (N, D, n)) * (1.0 / jnp.sqrt(n))
    y = jax.random.normal(ky, (N,))
    cfg = GibbsConfig()
    params = init_gibbs_params(model, kp, cfg)

    # scan-ified sweep (jitted once, steady state)
    fast = jax.jit(lambda p, k: gibbs_sweep_columnwise(model, p, k, phi, y, cfg))
    out = fast(params, ks)
    jax.block_until_ready(out.w)
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        out = fast(out, jax.random.fold_in(ks, i))
    jax.block_until_ready(out.w)
    t_fast = (time.perf_counter() - t0) / reps

    # round-1 loop (un-jitted Python loop, as it ran)
    t0 = time.perf_counter()
    out2 = naive_columnwise_sweep(model, params, ks, phi, y, cfg)
    jax.block_until_ready(out2.w)
    t_naive = time.perf_counter() - t0

    metrics = {
        "config": f"kin40k N={N} n={n} r={r} D={D} Q={Q} ({D*r} columns)",
        "scan_sweep_seconds": round(t_fast, 3),
        "python_loop_sweep_seconds": round(t_naive, 3),
        "speedup": round(t_naive / t_fast, 1),
        "backend": jax.default_backend(),
    }
    append_record(os.path.join(ROOT, "RECORDS.jsonl"), "colgibbs_scan_speedup", metrics)
    print(metrics)


if __name__ == "__main__":
    main()
