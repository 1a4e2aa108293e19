"""Micro-repro: feed the fused step corrupted inputs on TPU, check guards.

Cases (chain index within a CB=8 block):
  1: U[1] has one NaN entry
  2: w[2] has a NaN
  3: U[3] scaled x1e20 (finite but absurd)
  4: w[4] scaled x1e20
  5: clean
Run ONE step; report which chains' outputs contain NaN / changed, and rej.
"""
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.ops.contraction import core_indicator
from gpt_tpu.ops.pallas_sgld import block_onehots, fused_sgld_step

D, n, r, Q, m = 4, 100, 10, 100, 100
C, CB, mc = 8, 8, 25

key = jax.random.PRNGKey(3)
kI, kphi, ky, kp = jax.random.split(key, 4)
I = sample_core_indices(kI, r, D, Q)
model = TensorGP(n=n, r=r, D=D, I=I, signal_var=0.5)
phi = jax.random.normal(kphi, (m, D, n), jnp.float32) * 0.3
y = jax.random.normal(ky, (m,), jnp.float32)
params0 = jax.vmap(model.init_params)(jax.random.split(kp, C))

w = np.array(params0.w)
U = np.array(params0.U)
U[1, 0, 5, 3] = np.nan
w[2, 7] = np.nan
U[3] *= 1e20
w[4] *= 1e20

NB = C // CB
Mch = m // mc
w3 = jnp.asarray(w).reshape(NB, 1, CB * Q)
U4 = jnp.transpose(jnp.asarray(U).reshape(NB, CB, D, n, r),
                   (0, 2, 3, 1, 4)).reshape(NB, D, n, CB * r)
phi_b = phi.astype(jnp.bfloat16).reshape(Mch, mc, D, n)
y_b = y.reshape(Mch, mc, 1)
wts = jnp.ones((Mch, mc, 1), jnp.float32)
ohf, ohb = block_onehots(core_indicator(I, r, dtype=jnp.float32), CB)
scalars = jnp.array([[1.0, 1e-4, 1e-7, 0.0]], jnp.float32)
seed = jnp.array([[1234]], jnp.int32)

w3n, U4n, rej = jax.jit(
    lambda *a: fused_sgld_step(
        *a, r=r, ns_iters=2, langevin=True, sigma_w2=1.0, signal_var=0.5,
    )
)(w3, U4, phi_b, y_b, wts, ohf, ohb, scalars, seed)

wn = np.asarray(w3n).reshape(C, Q)
Un = np.transpose(np.asarray(U4n).reshape(NB, D, n, CB, r),
                  (0, 3, 1, 2, 4)).reshape(C, D, n, r)
rej = np.asarray(rej).reshape(C)
for c in range(C):
    print(
        f"chain {c}: rej={rej[c]} w_nan={np.isnan(wn[c]).any()} "
        f"U_nan={np.isnan(Un[c]).any()} "
        f"w_max={np.abs(wn[c]).max():.2e} U_max={np.abs(Un[c]).max():.2e}",
        flush=True,
    )
