"""Benchmark the megafused Pallas SGLD step vs the XLA-op-graph path.

Usage: python scripts/megafused_probe.py [C ...] [--cb CB] [--mc MC]
Prints chain-steps/s for the megafused runner at each chain count on the
PP headline config (n=100, r=10, Q=100, m=100, Ntrain=5000), plus an
end-state health check (finite w, on-manifold U).
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

from gpt_tpu.data import load_kin40k, load_power_plant
from gpt_tpu.experiments import configs as _CFG
from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.inference import SGLDConfig
from gpt_tpu.inference.sgld import collect_nothing, run_sgld_megafused
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams

args = [a for a in sys.argv[1:] if not a.startswith("--")]
Cs = [int(a) for a in args] or [256, 1024, 4096]
CB = 16
MC = 32
DATASET = "pp"
for a in sys.argv[1:]:
    if a.startswith("--cb="):
        CB = int(a.split("=")[1])
    if a.startswith("--mc="):
        MC = int(a.split("=")[1])
    if a.startswith("--preset="):
        DATASET = a.split("=")[1]
if DATASET == "kin40k":
    PRESET = _CFG.KIN40K_TENSOR
    load_split = load_kin40k
else:
    PRESET = _CFG.POWER_PLANT_TENSOR_SMALL
    load_split = load_power_plant

EPOCHS = 10


def main():
    split = load_split()
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
    model = TensorGP(n=PRESET.n, r=PRESET.r, D=D, I=I, signal_var=PRESET.signal_var)
    config = SGLDConfig(
        eps=TensorGPParams(w=PRESET.epsw, U=PRESET.epsU), transport="polar"
    )
    print(f"preset={DATASET} n={PRESET.n} r={PRESET.r} Q={PRESET.Q} m={PRESET.m} CB={CB} mc={MC}")
    for C in Cs:
        params0 = jax.vmap(model.init_params)(jax.random.split(kp, C))
        t0 = time.perf_counter()
        out = run_sgld_megafused(
            model, params0, ks, phi, y, m=PRESET.m, config=config,
            burnin=EPOCHS, maxepoch=0, collect_fn=collect_nothing,
            chain_block=CB, data_chunk=MC,
        )
        jax.block_until_ready(out[0].w)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        finals, _, rejected = run_sgld_megafused(
            model, params0, ks, phi, y, m=PRESET.m, config=config,
            burnin=EPOCHS, maxepoch=0, collect_fn=collect_nothing,
            chain_block=CB, data_chunk=MC,
        )
        jax.block_until_ready(finals.w)
        dt = time.perf_counter() - t0
        steps = C * num_batches * EPOCHS
        w_ok = jnp.all(jnp.isfinite(finals.w), axis=-1)
        UtU = jnp.einsum("cdni,cdnj->cdij", finals.U, finals.U,
                         precision=jax.lax.Precision.HIGHEST)
        orth_err = jnp.max(
            jnp.abs(UtU - jnp.eye(PRESET.r, dtype=UtU.dtype)), axis=(-3, -2, -1)
        )
        bad = int(jnp.sum(~w_ok | ~(orth_err < 1e-2)))
        print(
            f"C={C:6d}  {steps/dt:12,.0f} chain-steps/s   "
            f"({dt/ (num_batches*EPOCHS) *1e6:8.1f} us/step)  "
            f"rej={int(rejected)} bad={bad} "
            f"max_orth={float(jnp.max(orth_err)):.2e} (compile {compile_s:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
