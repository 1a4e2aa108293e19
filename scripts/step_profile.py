"""Microprofile of the bench SGLD step: where does the per-step time go?

Times (per call, C chains): likelihood grad, Stiefel transport chain
(project + retract + orthonormalize + orthogonality check), noise generation,
and the full transition kernel — plus XLA cost-model bytes for the scanned
step, giving the HBM roofline (bytes/step vs ~819 GB/s on v5e) for the
>256-chain bandwidth-bound regime.

Usage: python scripts/step_profile.py [num_chains] [transport] [prng_impl]
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

C = int(sys.argv[1]) if len(sys.argv) > 1 else 256
TRANSPORT = sys.argv[2] if len(sys.argv) > 2 else "polar"
if len(sys.argv) > 3:
    jax.config.update("jax_default_prng_impl", sys.argv[3])

import jax.numpy as jnp

from gpt_tpu.data import load_power_plant
from gpt_tpu.experiments.configs import POWER_PLANT_TENSOR_SMALL as PRESET
from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.inference import SGLDConfig, make_sgld_step, run_sgld
from gpt_tpu.inference.sgld import sgld_init
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams
from gpt_tpu.utils import stiefel

STEPS = 100


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:35s} {dt*1e3:8.3f} ms", flush=True)
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
    model = TensorGP(n=PRESET.n, r=PRESET.r, D=D, I=I, signal_var=PRESET.signal_var)
    config = SGLDConfig(
        eps=TensorGPParams(w=PRESET.epsw, U=PRESET.epsU), transport=TRANSPORT
    )
    print(f"C={C} transport={TRANSPORT} prng={jax.config.jax_default_prng_impl}")
    params = jax.vmap(model.init_params)(jax.random.split(kp, C))

    idx = jnp.arange(PRESET.m)
    phi_b, y_b = phi[idx], y[idx]
    wts = jnp.ones((PRESET.m,), jnp.float32)

    @jax.jit
    def grad_only(p):
        def logp(pp):
            ll = model.log_lik(pp, phi_b, y_b, weight=wts)
            return jnp.sum(N / PRESET.m * ll + model.log_prior(pp))
        return jax.grad(logp)(p)

    grads = timeit("grad(log_joint)", grad_only, params)

    @jax.jit
    def fwd_only(p):
        return model.log_lik(p, phi_b, y_b, weight=wts)

    timeit("forward log_lik", fwd_only, params)

    def retract(U, mom, sqe):
        if TRANSPORT == "polar":
            return stiefel.polar_retract(U, mom, sqe)
        newU = stiefel.cayley_retract(U, mom, sqe)
        return stiefel.orthonormalize(newU)

    @jax.jit
    def transport_only(p, g):
        sqe = jnp.sqrt(jnp.asarray(PRESET.epsU, jnp.float32))
        noise = jnp.zeros_like(p.U)
        mom = stiefel.project_tangent(p.U, sqe * g.U / 2 + noise)
        newU = retract(p.U, mom, sqe)
        UtU = jnp.einsum("...ni,...nj->...ij", newU, newU,
                         precision=jax.lax.Precision.HIGHEST)
        err = jnp.max(jnp.abs(UtU - jnp.eye(newU.shape[-1])), axis=(-2, -1))
        return jnp.where((err > 1e-2)[..., None, None], p.U, newU)

    timeit("stiefel transport chain", transport_only, params, grads)

    @jax.jit
    def retract_only(p, g):
        return retract(p.U, g.U, 1e-4)

    timeit(f"  {TRANSPORT}_retract", retract_only, params, grads)

    @jax.jit
    def project_only(p, g):
        return stiefel.project_tangent(p.U, g.U)

    timeit("  project_tangent", project_only, params, grads)

    @jax.jit
    def orthcheck_only(p):
        UtU = jnp.einsum("...ni,...nj->...ij", p.U, p.U,
                         precision=jax.lax.Precision.HIGHEST)
        return jnp.max(jnp.abs(UtU - jnp.eye(p.U.shape[-1])), axis=(-2, -1))

    timeit("  orth-err check", orthcheck_only, params)

    @jax.jit
    def ortho_only(p):
        return stiefel.orthonormalize(p.U)

    timeit("  orthonormalize", ortho_only, params)

    @jax.jit
    def noise_only(k):
        ks = jax.random.split(k, 2)
        return (jax.random.normal(ks[0], (C, PRESET.Q)),
                jax.random.normal(ks[1], (C, D, PRESET.n, PRESET.r)))

    timeit("noise generation", noise_only, ks)

    step = make_sgld_step(lambda p, b: grad_only(p), model.manifolds, config)
    st0 = sgld_init(params, ks, config)

    @jax.jit
    def full_step(st):
        return step(st, None)

    timeit("full transition kernel", full_step, st0)

    # scanned step (how the bench runs it) — amortises dispatch
    @jax.jit
    def scanned(st):
        return jax.lax.scan(lambda s, _: (step(s, None), None), st, None, length=50)[0]

    compiled = scanned.lower(st0).compile()
    out = compiled(st0)
    jax.block_until_ready(out.params.w)
    t0 = time.perf_counter()
    out = compiled(st0)
    jax.block_until_ready(out.params.w)
    dt = time.perf_counter() - t0
    per_step = dt / 50
    print(f"{'scanned step (50x, per step)':35s} {per_step*1e3:8.3f} ms", flush=True)

    # HBM roofline: XLA cost-model bytes for the 50-step program
    cost = compiled.cost_analysis()
    if cost:
        ba = cost.get("bytes accessed", float("nan")) / 50
        flops = cost.get("flops", float("nan")) / 50
        bw = ba / per_step / 1e9
        print(f"{'bytes/step (cost model)':35s} {ba/1e6:8.2f} MB")
        print(f"{'flops/step (cost model)':35s} {flops/1e9:8.3f} GF")
        print(f"{'achieved HBM bandwidth':35s} {bw:8.1f} GB/s "
              f"({bw/819*100:.1f}% of v5e 819 GB/s)")
        print(f"{'fleet chain-steps/s':35s} {C/per_step:,.0f}")


if __name__ == "__main__":
    main()
