"""Compare SGLD chain-throughput backends on the bench workload.

Variants:
  vmap-onehot   — run_sgld_chains (vmapped), XLA one-hot contraction (old default)
  fused-onehot  — run_sgld_chains_fused, XLA one-hot contraction
  fused-pallas  — run_sgld_chains_fused, fused Pallas kernel

Usage: python scripts/fused_bench.py [num_chains ...]
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp

from gpt_tpu.data import load_power_plant
from gpt_tpu.experiments.configs import POWER_PLANT_TENSOR_SMALL as PRESET
from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.inference import SGLDConfig, run_sgld_chains, run_sgld_chains_fused
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams


def main():
    chain_counts = [int(a) for a in sys.argv[1:]] or [256]
    epochs = 5

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
    num_batches = -(-N // PRESET.m)

    base = TensorGP(n=PRESET.n, r=PRESET.r, D=D, I=I, signal_var=PRESET.signal_var)
    config = SGLDConfig(
        eps=TensorGPParams(w=PRESET.epsw, U=PRESET.epsU), transport="cayley"
    )
    config_polar = dataclasses.replace(config, transport="polar")

    for C in chain_counts:
        params0 = jax.vmap(base.init_params)(jax.random.split(kp, C))
        keys = jax.random.split(ks, C)

        def run_vmap(model, cfg):
            finals, _ = run_sgld_chains(
                model, params0, keys, phi, y, m=PRESET.m, config=cfg,
                burnin=epochs, maxepoch=0, collect_fn=lambda p: (),
            )
            return finals

        def run_fused(model, cfg):
            finals, _ = run_sgld_chains_fused(
                model, params0, ks, phi, y, m=PRESET.m, config=cfg,
                burnin=epochs, maxepoch=0, collect_fn=lambda p: (),
            )
            return finals

        variants = {
            "vmap-onehot": (run_vmap, base, config),
            "fused-onehot": (run_fused, base, config),
            "fused-pallas": (run_fused, dataclasses.replace(base, contraction="pallas", diff_phi=False), config),
            "vmap-polar": (run_vmap, base, config_polar),
            "fused-polar": (run_fused, base, config_polar),
            "fused-polar-pallas": (run_fused, dataclasses.replace(base, contraction="pallas", diff_phi=False), config_polar),
        }
        for name, (runner, model, cfg) in variants.items():
            try:
                jax.block_until_ready(runner(model, cfg).params.w)  # compile
                t0 = time.perf_counter()
                finals = runner(model, cfg)
                jax.block_until_ready(finals.params.w)
                dt = time.perf_counter() - t0
                sps = C * num_batches * epochs / dt
                rej = int(jnp.sum(finals.rejected))
                print(f"C={C:4d} {name:13s} {sps:10.1f} samples/s  ({dt:.3f}s, rejected={rej})", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"C={C:4d} {name:13s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
