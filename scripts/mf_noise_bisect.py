"""Isolate the megafused slowness: PRNG vs injected noise vs no noise."""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax.numpy as jnp

from gpt_tpu.data import load_power_plant
from gpt_tpu.experiments.configs import POWER_PLANT_TENSOR_SMALL as PRESET
from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.inference import SGLDConfig
from gpt_tpu.inference import sgld as sgld_mod
from gpt_tpu.inference.sgld import collect_nothing
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams

C = 64
CB = 8
EPOCHS = 5

split = load_power_plant()
key = jax.random.PRNGKey(17)
kI, kf, kp, ks = jax.random.split(key, 4)
D = split.X_train.shape[1]
I = sample_core_indices(kI, PRESET.r, D, PRESET.Q)
phi = tensor_features(
    jnp.asarray(split.X_train, jnp.float32), sample_tensor_rff(kf, PRESET.n, D),
    PRESET.length_scale, PRESET.sigma_RBF,
    tensor_phi_scale(PRESET.n, PRESET.Q, D),
)
y = jnp.asarray(split.y_train, jnp.float32)
num_batches = -(-y.shape[0] // PRESET.m)
model = TensorGP(n=PRESET.n, r=PRESET.r, D=D, I=I, signal_var=PRESET.signal_var)
params0 = jax.vmap(model.init_params)(jax.random.split(kp, C))


def run(name, config):
    def go():
        finals, _, rej = sgld_mod.run_sgld_megafused(
            model, params0, ks, phi, y, m=PRESET.m, config=config,
            burnin=EPOCHS, maxepoch=0, collect_fn=collect_nothing,
            chain_block=CB, data_chunk=25,
        )
        jax.block_until_ready(finals.w)
        return rej

    go()
    t0 = time.perf_counter()
    rej = go()
    dt = time.perf_counter() - t0
    steps = num_batches * EPOCHS
    print(f"{name:22s} {dt/steps*1e6:9.1f} us/step  rej={int(rej)}", flush=True)


cfg_l = SGLDConfig(eps=TensorGPParams(w=PRESET.epsw, U=PRESET.epsU),
                   transport="polar")
cfg_nol = dataclasses.replace(cfg_l, langevin=False)

run("langevin=False", cfg_nol)
run("langevin=True tpuprng", cfg_l)
