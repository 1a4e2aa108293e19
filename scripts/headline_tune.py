"""Final headline tuning: chains × PRNG impl × contraction mode (fused+polar).

Run with an idle host (no concurrent pytest) — host contention distorts
dispatch-bound timings.
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import dataclasses

import jax.numpy as jnp

from gpt_tpu.data import load_power_plant
from gpt_tpu.experiments.configs import POWER_PLANT_TENSOR_SMALL as P
from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.inference import SGLDConfig, run_sgld_chains_fused
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams


def main():
    chains = [int(a) for a in sys.argv[1:]] or [256, 512, 1024]
    split = load_power_plant()
    key = jax.random.PRNGKey(17)
    kI, kf, kp, _ = jax.random.split(key, 4)
    D = split.X_train.shape[1]
    I = sample_core_indices(kI, P.r, D, P.Q)
    rff = sample_tensor_rff(kf, P.n, D)
    phi = tensor_features(
        jnp.asarray(split.X_train, jnp.float32), rff,
        P.length_scale, P.sigma_RBF, tensor_phi_scale(P.n, P.Q, D),
    )
    y = jnp.asarray(split.y_train, jnp.float32)
    B = -(-y.shape[0] // P.m)
    base = TensorGP(n=P.n, r=P.r, D=D, I=I, signal_var=P.signal_var)
    cfg = SGLDConfig(eps=TensorGPParams(w=P.epsw, U=P.epsU), transport="polar")

    for C in chains:
        params0 = jax.vmap(base.init_params)(jax.random.split(kp, C))
        for impl in ("threefry2x32", "rbg"):
            ks = jax.random.key(1017, impl=impl)
            for mode in ("onehot", "dense"):
                model = dataclasses.replace(base, contraction=mode)

                def run():
                    f, _ = run_sgld_chains_fused(
                        model, params0, ks, phi, y, m=P.m, config=cfg,
                        burnin=5, maxepoch=0, collect_fn=lambda p: (),
                    )
                    return f

                jax.block_until_ready(run().params.w)
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    f = run()
                    jax.block_until_ready(f.params.w)
                    best = min(best, time.perf_counter() - t0)
                w_ok = jnp.all(jnp.isfinite(f.params.w), axis=-1)
                UtU = jnp.einsum("cdni,cdnj->cdij", f.params.U, f.params.U)
                oe = jnp.max(jnp.abs(UtU - jnp.eye(P.r)), axis=(-3, -2, -1))
                bad = int(jnp.sum(~w_ok | ~(oe < 1e-2)))
                print(f"C={C:5d} {impl:12s} {mode:7s} {C*B*5/best:10.1f} samples/s "
                      f"({best:.3f}s, bad_chains={bad})", flush=True)


if __name__ == "__main__":
    main()
