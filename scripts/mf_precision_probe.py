"""Micro-probe: does a Pallas TPU f32 dot honor precision=HIGHEST?

Computes X^T X for an orthonormal-ish f32 matrix inside a kernel at each
precision and compares against the f64 CPU answer. Also times a grid of
dummy cells to measure per-grid-cell overhead.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n, k = 100, 80
key = jax.random.PRNGKey(0)
X = jax.random.normal(key, (n, k), jnp.float32) * 0.1
ref = np.asarray(X, np.float64).T @ np.asarray(X, np.float64)

for prec in ("DEFAULT", "HIGH", "HIGHEST"):
    p = getattr(jax.lax.Precision, prec)

    def kern(x_ref, o_ref, p=p):
        x = x_ref[...]
        o_ref[...] = jax.lax.dot_general(
            x, x, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=p,
        )

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((k, k), jnp.float32),
    )(X)
    err = float(np.max(np.abs(np.asarray(out, np.float64) - ref)))
    print(f"pallas dot precision={prec}: max err {err:.3e}", flush=True)

# XLA (non-pallas) comparison
for prec in ("DEFAULT", "HIGHEST"):
    p = getattr(jax.lax.Precision, prec)
    out = jax.jit(
        lambda x: jax.lax.dot_general(
            x, x, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=p,
        )
    )(X)
    err = float(np.max(np.abs(np.asarray(out, np.float64) - ref)))
    print(f"xla    dot precision={prec}: max err {err:.3e}", flush=True)

# --- grid-cell overhead: G cells each doing one tiny matmul --------------
for G in (32, 128):
    def gkern(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = jnp.dot(x, x.T, preferred_element_type=jnp.float32)

    f = jax.jit(
        lambda x: pl.pallas_call(
            gkern,
            grid=(G,),
            in_specs=[pl.BlockSpec((n, k), lambda c: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n, n), lambda c: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        )(x)
    )
    out = f(X); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(100):
        out = f(X)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 100
    print(f"grid={G}: {dt*1e6:.1f} us total, {dt/G*1e6:.2f} us/cell", flush=True)
