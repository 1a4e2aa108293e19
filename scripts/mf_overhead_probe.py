"""Measure per-iteration overhead of a pallas_call inside lax.scan on the
axon TPU: trivial kernel vs pure-XLA op, at two sizes and grid shapes."""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 200


def timeit(name, f, x):
    out = f(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name:40s} {dt/STEPS*1e6:9.1f} us/iter", flush=True)


def make_pallas_scan(shape, grid):
    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 1.000001 + 1e-9

    n0 = shape[0] // (grid[0] if grid else 1)

    def step(x, _):
        if grid:
            y = pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[pl.BlockSpec((n0, shape[1]), lambda c: (c, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((n0, shape[1]), lambda c: (c, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
                input_output_aliases={0: 0},
            )(x)
        else:
            y = pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
                input_output_aliases={0: 0},
            )(x)
        return y, None

    return jax.jit(lambda x: jax.lax.scan(step, x, None, length=STEPS)[0])


def make_xla_scan(shape):
    def step(x, _):
        return x * 1.000001 + 1e-9, None

    return jax.jit(lambda x: jax.lax.scan(step, x, None, length=STEPS)[0])


for shape in ((8, 128), (1024, 1024)):
    x = jnp.ones(shape, jnp.float32)
    timeit(f"xla scan {shape}", make_xla_scan(shape), x)
    timeit(f"pallas scan {shape} no grid", make_pallas_scan(shape, None), x)
    timeit(f"pallas scan {shape} grid=(8,)", make_pallas_scan(shape, (8,)), x)
