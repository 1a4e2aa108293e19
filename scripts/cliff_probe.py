"""Probe the >256-chain scaling cliff: time each step component variant.

Findings feed SCALING_chains.md / SPEEDLIGHT.md. The cliff is NOT
HBM-bandwidth-bound (measured 14 GB/s = 1.7% of v5e peak at 4096 chains) —
it is tiny-matmul / pass-count bound: batched (100×10)-sized einsums at
HIGHEST precision (6 bf16 passes each) and a likelihood backward that
re-materialises the (C, m, D, Q) product intermediates.

Usage: python scripts/cliff_probe.py [C]
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

C = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

import jax.numpy as jnp

from gpt_tpu.data import load_power_plant
from gpt_tpu.experiments.configs import POWER_PLANT_TENSOR_SMALL as PRESET
from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.utils import stiefel

STEPS = 50


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:45s} {dt*1e3:8.3f} ms", flush=True)
    return out


def main():
    split = load_power_plant()
    key = jax.random.PRNGKey(17)
    kI, kf, kp, ks = jax.random.split(key, 4)
    D = split.X_train.shape[1]
    I = sample_core_indices(kI, PRESET.r, D, PRESET.Q)
    rff = sample_tensor_rff(kf, PRESET.n, D)
    phi = tensor_features(
        jnp.asarray(split.X_train, jnp.float32), rff,
        PRESET.length_scale, PRESET.sigma_RBF,
        tensor_phi_scale(PRESET.n, PRESET.Q, D),
    )
    y = jnp.asarray(split.y_train, jnp.float32)
    N = y.shape[0]
    print(f"C={C}")

    idx = jnp.arange(PRESET.m)
    phi_b, y_b = phi[idx], y[idx]
    wts = jnp.ones((PRESET.m,), jnp.float32)

    base = TensorGP(n=PRESET.n, r=PRESET.r, D=D, I=I, signal_var=PRESET.signal_var)
    params = jax.vmap(base.init_params)(jax.random.split(kp, C))

    for mode in ["onehot", "gather", "dense"]:
        model = TensorGP(n=PRESET.n, r=PRESET.r, D=D, I=I,
                         signal_var=PRESET.signal_var, contraction=mode)

        @jax.jit
        def grad_only(p):
            def logp(pp):
                ll = model.log_lik(pp, phi_b, y_b, weight=wts)
                return jnp.sum(N / PRESET.m * ll + model.log_prior(pp))
            return jax.grad(logp)(p)

        timeit(f"grad(log_joint) contraction={mode}", grad_only, params)

    g = jax.jit(lambda p: jax.grad(
        lambda pp: jnp.sum(base.log_lik(pp, phi_b, y_b, weight=wts)))(p))(params)

    # transport variants
    for iters in [3, 2, 1]:
        @jax.jit
        def polar_i(p, gg, it=iters):
            mom = stiefel.project_tangent(p.U, gg.U)
            return stiefel.polar_retract(p.U, mom, 1e-4, iters=it)

        timeit(f"project+polar_retract iters={iters}", polar_i, params, g)

    @jax.jit
    def project_default_precision(p, gg):
        UtV = jnp.einsum("...ji,...jk->...ik", p.U, gg.U)
        sym = (UtV + jnp.swapaxes(UtV, -1, -2)) / 2
        return gg.U - jnp.einsum("...ij,...jk->...ik", p.U, sym)

    timeit("project_tangent @ default precision", project_default_precision, params, g)

    # noise: threefry vs rbg
    kt = jax.random.PRNGKey(3)
    kr = jax.random.key(3, impl="rbg")
    for name, kk in [("threefry", kt), ("rbg", kr)]:
        @jax.jit
        def noise_only(k):
            k1, k2 = jax.random.split(k)
            return (jax.random.normal(k1, (C, PRESET.Q)),
                    jax.random.normal(k2, (C, D, PRESET.n, PRESET.r)))

        timeit(f"noise generation ({name})", noise_only, kk)


if __name__ == "__main__":
    main()
