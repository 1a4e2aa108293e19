"""Microprofile of the bench SGLD step: where does the 2.4 ms/step go?

Times (per call, C chains): likelihood grad, Stiefel transport chain
(project + cayley + orthonormalize + orthogonality check), noise generation,
and the full transition kernel.
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp

from gpt_tpu.data import load_power_plant
from gpt_tpu.experiments.configs import POWER_PLANT_TENSOR_SMALL as PRESET
from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.inference import SGLDConfig, make_sgld_step, run_sgld
from gpt_tpu.inference.sgld import sgld_init
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams
from gpt_tpu.utils import stiefel

C = 256
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
    config = SGLDConfig(eps=TensorGPParams(w=PRESET.epsw, U=PRESET.epsU), transport="cayley")
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

    @jax.jit
    def transport_only(p, g):
        sqe = jnp.sqrt(jnp.asarray(PRESET.epsU, jnp.float32))
        noise = jnp.zeros_like(p.U)
        mom = stiefel.project_tangent(p.U, sqe * g.U / 2 + noise)
        newU = stiefel.cayley_retract(p.U, mom, sqe)
        newU = stiefel.orthonormalize(newU)
        UtU = jnp.einsum("...ni,...nj->...ij", newU, newU,
                         precision=jax.lax.Precision.HIGHEST)
        err = jnp.max(jnp.abs(UtU - jnp.eye(newU.shape[-1])), axis=(-2, -1))
        return jnp.where((err > 1e-2)[..., None, None], p.U, newU)

    timeit("stiefel transport chain", transport_only, params, grads)

    @jax.jit
    def cayley_only(p, g):
        return stiefel.cayley_retract(p.U, g.U, 1e-4)

    timeit("  cayley_retract", cayley_only, params, grads)

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

    out = scanned(st0)
    jax.block_until_ready(out.params.w)
    t0 = time.perf_counter()
    out = scanned(st0)
    jax.block_until_ready(out.params.w)
    dt = time.perf_counter() - t0
    print(f"{'scanned step (50x, per step)':35s} {dt/50*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
