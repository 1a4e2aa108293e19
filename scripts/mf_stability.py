"""Long-run stability of the megafused kernel on the real PP workload.

Runs the headline config (POWER_PLANT_TENSOR_SMALL) for E epochs with the
megafused runner and the XLA fused runner, reporting rejection counts and
end-state health (finite w, orthonormality at HIGHEST precision).
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

from gpt_tpu.data import load_power_plant
from gpt_tpu.experiments.configs import POWER_PLANT_TENSOR_SMALL as PRESET
from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.inference import SGLDConfig
from gpt_tpu.inference.sgld import collect_nothing, run_sgld_chains_fused, run_sgld_megafused
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams

C = int(sys.argv[1]) if len(sys.argv) > 1 else 64
E = int(sys.argv[2]) if len(sys.argv) > 2 else 10

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
model = TensorGP(n=PRESET.n, r=PRESET.r, D=D, I=I, signal_var=PRESET.signal_var)
config = SGLDConfig(
    eps=TensorGPParams(w=PRESET.epsw, U=PRESET.epsU), transport="polar"
)
params0 = jax.vmap(model.init_params)(jax.random.split(kp, C))
print(f"C={C} E={E} epsw={PRESET.epsw} epsU={PRESET.epsU} "
      f"signal_var={PRESET.signal_var}", flush=True)


def health(pf, label, wall, rej):
    UtU = jnp.einsum(
        "cdni,cdnj->cdij", pf.U, pf.U,
        precision=jax.lax.Precision.HIGHEST,
    )
    orth = jnp.max(jnp.abs(UtU - jnp.eye(PRESET.r)), axis=(-3, -2, -1))
    w_ok = jnp.all(jnp.isfinite(pf.w), axis=-1)
    print(
        f"{label:10s} wall={wall:7.2f}s rej={rej:7d} "
        f"badw={int(jnp.sum(~w_ok))} max_orth={float(jnp.max(orth)):.2e} "
        f"median_orth={float(jnp.median(orth)):.2e} "
        f"w_rms={float(jnp.sqrt(jnp.mean(pf.w**2))):.4f}",
        flush=True,
    )


# megafused, epoch by epoch to localise when rejections start
t0 = time.time()
pf, _, rej = run_sgld_megafused(
    model, params0, ks, phi, y, m=PRESET.m, config=config,
    burnin=E, maxepoch=0, collect_fn=collect_nothing, chain_block=8,
    data_chunk=25,
)
jax.block_until_ready(pf.w)
health(pf, "megafused", time.time() - t0, int(rej))

t0 = time.time()
final, _ = run_sgld_chains_fused(
    model, params0, ks, phi, y, m=PRESET.m, config=config,
    burnin=E, maxepoch=0, collect_fn=collect_nothing,
)
jax.block_until_ready(final.params.w)
health(final.params, "xla-fused", time.time() - t0, int(final.rejected))
