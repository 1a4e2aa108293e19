"""Per-step collective overhead of the DP-sharded SGLD step (CPU mesh).

VERDICT r3 ask #8: the old SCALING_devices.md efficiency table (50% at 8
virtual devices) measured CPU core oversubscription, not the sharding design.
What IS meaningful on a virtual mesh:

1. **psum-only microbenchmark** — a jitted scan that does nothing but
   all-reduce a gradient-sized pytree over the K-device data axis: the
   per-step collective cost in isolation (fixed-per-device-work full steps
   are compute-confounded on a shared-core host: K virtual devices do K x
   the host FLOPs, so their wall-time growth measures core contention, not
   collectives — the same artifact as the retired efficiency table).
2. **Full step at FIXED GLOBAL work** — one 800-row minibatch sharded over
   K devices: total host FLOPs constant in K, so the wall-time delta vs
   K=1 is SPMD partitioning + collective overhead (minus any thread-level
   parallel speedup).
3. **Bytes each collective moves** — analytic, from the gradient pytree size
   and the ring all-reduce factor 2(K-1)/K; with the ICI bandwidth of real
   hardware this bounds the on-chip collective cost the virtual mesh cannot
   show.

Writes RECORDS ``dp_collective_overhead``.
"""
import os
from functools import partial
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from gpt_tpu.data import load_power_plant
from gpt_tpu.experiments.configs import POWER_PLANT_TENSOR_SMALL as P
from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.inference import SGLDConfig
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams
from gpt_tpu.parallel.chains import init_chain_states, make_multichip_sgld_step
from gpt_tpu.parallel.mesh import make_mesh
from gpt_tpu.utils.records import append_record

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORDS = os.path.join(ROOT, "RECORDS.jsonl")


def time_steps(step, states, phi_b, y_b, wts_b, iters=200, reps=3):
    """Steady state: `iters` sharded steps inside ONE jitted scan."""

    @jax.jit
    def many(states):
        def body(st, _):
            return step(st, phi_b, y_b, wts_b), ()

        return jax.lax.scan(body, states, None, length=iters)[0]

    out = many(states)
    jax.block_until_ready(jax.tree.leaves(out.params)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = many(states)
        jax.block_until_ready(jax.tree.leaves(out.params)[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    C = 32           # chains (replicated across the data axis)
    m_local = 100    # per-device minibatch rows — FIXED per-device work
    split = load_power_plant()
    key = jax.random.PRNGKey(17)
    kI, kf, ks = jax.random.split(key, 3)
    D = split.X_train.shape[1]
    I = sample_core_indices(kI, P.r, D, P.Q)
    rff = sample_tensor_rff(kf, P.n, D)
    phi = tensor_features(
        jnp.asarray(split.X_train, jnp.float32), rff,
        P.length_scale, P.sigma_RBF, tensor_phi_scale(P.n, P.Q, D),
    )
    y = jnp.asarray(split.y_train, jnp.float32)
    N = int(y.shape[0])
    model = TensorGP(n=P.n, r=P.r, D=D, I=I, signal_var=P.signal_var)
    config = SGLDConfig(eps=TensorGPParams(w=P.epsw, U=P.epsU), transport="polar")

    # analytic collective volume: the psum'd gradient pytree (C chains of
    # (Q,) + (D, n, r) f32) + the psum'd batch-weight scalar, ring-reduced
    grad_floats = C * (P.Q + D * P.n * P.r)
    grad_bytes = 4 * (grad_floats + 1)

    from jax import shard_map
    from jax.sharding import PartitionSpec as PS

    from gpt_tpu.parallel.mesh import DATA_AXIS

    mb_global = 8 * m_local  # fixed GLOBAL batch for study B
    rows = []
    for K in (1, 2, 4, 8):
        mesh = make_mesh(1, K, devices=jax.devices()[:K])
        ring = 2 * (K - 1) / K

        # A: psum-only — all-reduce a gradient-sized pytree, nothing else
        buf_w = jnp.ones((C, P.Q), jnp.float32)
        buf_U = jnp.ones((C, D, P.n, P.r), jnp.float32)

        @jax.jit
        @partial(shard_map, mesh=mesh, in_specs=(PS(), PS()),
                 out_specs=(PS(), PS()), check_vma=False)
        def psum_many(w, U):
            def body(c, _):
                w, U = c
                w = jax.lax.psum(w * (1.0 - 1e-12), DATA_AXIS) / K
                U = jax.lax.psum(U * (1.0 - 1e-12), DATA_AXIS) / K
                return (w, U), ()
            return jax.lax.scan(body, (w, U), None, length=200)[0]

        jax.block_until_ready(psum_many(buf_w, buf_U))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(psum_many(buf_w, buf_U))
            best = min(best, time.perf_counter() - t0)
        psum_us = best / 200 * 1e6

        # B: full sharded step at fixed GLOBAL work (800 rows over K shards)
        step = make_multichip_sgld_step(model, mesh, config, N, jit=False)
        states = init_chain_states(model, jax.random.fold_in(ks, K), C, config)
        idx = jnp.arange(mb_global) % N
        per_step = time_steps(step, states, phi[idx], y[idx],
                              jnp.ones((mb_global,), jnp.float32))

        rows.append(dict(
            data_shards=K,
            psum_only_us=round(psum_us, 1),
            full_step_us_fixed_global=round(per_step * 1e6, 1),
            psum_bytes_per_device=int(grad_bytes * ring),
            # what that volume costs on real ICI (v5e ~45 GB/s/link/dir)
            ici_us_at_45GBps=round(grad_bytes * ring / 45e9 * 1e6, 2),
        ))
        print(rows[-1], flush=True)

    append_record(RECORDS, "dp_collective_overhead", dict(
        chains=C, model="PP small preset", global_batch=mb_global,
        grad_psum_bytes=grad_bytes, rows=rows,
        note="psum-only = isolated collective cost on the virtual mesh; "
             "full step at fixed global work keeps host FLOPs constant in K",
    ))


if __name__ == "__main__":
    main()
