"""Stage-bisect the megafused SGLD kernel's per-step time on TPU, then
check long-run stability on the real PP workload vs the XLA fused path."""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.ops.contraction import core_indicator
from gpt_tpu.ops.pallas_sgld import block_onehots, fused_sgld_step

D, n, r, Q, m = 4, 100, 10, 100, 100
C, CB, mc = 64, 8, 25

key = jax.random.PRNGKey(3)
kI, kphi, ky, kp = jax.random.split(key, 4)
I = sample_core_indices(kI, r, D, Q)
model = TensorGP(n=n, r=r, D=D, I=I, signal_var=0.5)
phi = jax.random.normal(kphi, (m, D, n), jnp.float32) * 0.3
y = jax.random.normal(ky, (m,), jnp.float32)
params0 = jax.vmap(model.init_params)(jax.random.split(kp, C))

NB = C // CB
Mch = m // mc
w3 = params0.w.reshape(NB, 1, CB * Q)
U4 = jnp.transpose(params0.U.reshape(NB, CB, D, n, r), (0, 2, 3, 1, 4)).reshape(
    NB, D, n, CB * r
)
phi_b = phi.astype(jnp.bfloat16).reshape(Mch, mc, D, n)
y_b = y.reshape(Mch, mc, 1)
wts = jnp.ones((Mch, mc, 1), jnp.float32)
ohf, ohb = block_onehots(core_indicator(I, r, dtype=jnp.float32), CB)
scalars = jnp.array([[1.0, 1e-4, 1e-6, 0.0]], jnp.float32)
seed = jnp.array([[1234]], jnp.int32)

VARIANTS = [
    ("full", ("expand", "bwd", "manifold")),
    ("no-manifold", ("expand", "bwd")),
    ("no-bwd", ("expand", "manifold")),
    ("no-expand", ("bwd", "manifold")),
    ("fwd-only", ("expand",)),
    ("minimal", ()),
]

for name, stages in VARIANTS:
    for lang in (True,):
        f = jax.jit(
            lambda *a, s=stages, lg=lang: fused_sgld_step(
                *a, r=r, ns_iters=2, langevin=lg, sigma_w2=1.0,
                signal_var=0.5, stages=s,
            )
        )
        out = f(w3, U4, phi_b, y_b, wts, ohf, ohb, scalars, seed)
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        reps = 100
        for _ in range(reps):
            out = f(out[0], out[1], phi_b, y_b, wts, ohf, ohb, scalars, seed)
        jax.block_until_ready(out[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:12s} langevin={lang}: {dt*1e6:8.0f} us/step", flush=True)
