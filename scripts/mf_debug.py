"""Debug harness for the megafused Pallas SGLD kernel on real TPU.

Checks, in order:
1. single fused step, langevin=False, TPU vs the XLA-op-graph step — math path
2. single fused step, langevin=True, TPU in-kernel PRNG — noise moments
3. step timing at a few (C, CB) points
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams
from gpt_tpu.ops.contraction import core_indicator
from gpt_tpu.ops.pallas_sgld import block_onehots, fused_sgld_step

D, n, r, Q, m = 4, 100, 10, 100, 100
C, CB, mc = 64, 8, 25
sigma_w2 = 1.0
signal_var = 0.5

key = jax.random.PRNGKey(3)
kI, kphi, ky, kp = jax.random.split(key, 4)
I = sample_core_indices(kI, r, D, Q)
model = TensorGP(n=n, r=r, D=D, I=I, signal_var=signal_var)
phi = jax.random.normal(kphi, (m, D, n), jnp.float32) * 0.3
y = jax.random.normal(ky, (m,), jnp.float32)
params0 = jax.vmap(model.init_params)(jax.random.split(kp, C))

NB = C // CB
Mch = m // mc
eps_w, eps_U = 1e-4, 1e-6

w3 = params0.w.reshape(NB, 1, CB * Q)
U4 = jnp.transpose(params0.U.reshape(NB, CB, D, n, r), (0, 2, 3, 1, 4)).reshape(
    NB, D, n, CB * r
)
phi_b = phi.astype(jnp.bfloat16).reshape(Mch, mc, D, n)
y_b = y.reshape(Mch, mc, 1)
wts = jnp.ones((Mch, mc, 1), jnp.float32)
onehot = core_indicator(I, r, dtype=jnp.float32)
ohf, ohb = block_onehots(onehot, CB)
scalars = jnp.array([[1.0, eps_w, eps_U, 0.0]], jnp.float32)
seed = jnp.array([[1234]], jnp.int32)


def canon(w3n, U4n):
    w = w3n.reshape(C, Q)
    U = jnp.transpose(U4n.reshape(NB, D, n, CB, r), (0, 3, 1, 2, 4)).reshape(
        C, D, n, r
    )
    return w, U


def xla_reference():
    """One deterministic (langevin=False) step via the op-graph path."""
    from gpt_tpu.inference.sgld import SGLDConfig, make_sgld_step, sgld_init

    cfg = SGLDConfig(
        eps=TensorGPParams(w=eps_w, U=eps_U), transport="polar", langevin=False
    )

    def log_joint(p, batch):
        phi_bt, y_bt, wt = batch
        f = model.predict(p, phi_bt)
        ll = -0.5 / signal_var * jnp.sum(wt * (y_bt - f) ** 2)
        lp = -0.5 / sigma_w2 * jnp.sum(p.w**2)
        return 1.0 * ll + lp

    # emulate: full batch in order, scale=1 -> same gradient as the kernel
    def grad_fn(p, batch):
        return jax.grad(log_joint)(p, batch)

    step = make_sgld_step(grad_fn, model.manifolds, cfg)
    st = jax.vmap(lambda p: sgld_init(p, jax.random.PRNGKey(0), cfg))(params0)
    batch = (phi, y, jnp.ones_like(y))
    new = jax.vmap(lambda s: step(s, batch))(st)
    return new.params.w, new.params.U


print("=== 1. deterministic math path (TPU kernel vs XLA grad) ===", flush=True)
w3n, U4n, rej = jax.jit(
    lambda *a: fused_sgld_step(
        *a, r=r, ns_iters=2, langevin=False, sigma_w2=sigma_w2,
        signal_var=signal_var,
    )
)(w3, U4, phi_b, y_b, wts, ohf, ohb, scalars, seed)
wk, Uk = canon(w3n, U4n)
wx, Ux = xla_reference()
print("rej:", int(jnp.sum(rej)))
print("max|dw| =", float(jnp.max(jnp.abs(wk - wx))),
      " w scale:", float(jnp.max(jnp.abs(wx - params0.w))))
print("max|dU| =", float(jnp.max(jnp.abs(Uk - Ux))),
      " U step scale:", float(jnp.max(jnp.abs(Ux - params0.U))))

print("=== 2. langevin noise moments (TPU PRNG) ===", flush=True)
w3l, U4l, rejl = jax.jit(
    lambda *a: fused_sgld_step(
        *a, r=r, ns_iters=2, langevin=True, sigma_w2=sigma_w2,
        signal_var=signal_var,
    )
)(w3, U4, phi_b, y_b, wts, ohf, ohb, scalars, seed)
wl, Ul = canon(w3l, U4l)
noise_w = (wl - wk) / np.sqrt(eps_w)
print("rej:", int(jnp.sum(rejl)))
print("w-noise mean/std (want ~0/1):",
      float(jnp.mean(noise_w)), float(jnp.std(noise_w)))
print("finite:", bool(jnp.all(jnp.isfinite(wl))), bool(jnp.all(jnp.isfinite(Ul))))
UtU = jnp.einsum("cdni,cdnj->cdij", Ul, Ul)
print("max orth err:", float(jnp.max(jnp.abs(UtU - jnp.eye(r)))))

print("=== 3. timing ===", flush=True)
for lang in (False, True):
    f = jax.jit(
        lambda *a: fused_sgld_step(
            *a, r=r, ns_iters=2, langevin=lang, sigma_w2=sigma_w2,
            signal_var=signal_var,
        )
    )
    out = f(w3, U4, phi_b, y_b, wts, ohf, ohb, scalars, seed)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    reps = 50
    for _ in range(reps):
        out = f(out[0], out[1], phi_b, y_b, wts, ohf, ohb, scalars, seed)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"langevin={lang}: {dt*1e6:.0f} us/step ({C} chains, CB={CB})",
          flush=True)
