"""Accuracy parity of the megafused Pallas path on PP tensor SGLD → RECORDS.

Same protocol as `scripts/parity_run.py::pp_tensor_small` but every
transition runs through `run_sgld_megafused` (one pallas_call per step),
with a fleet of chains whose predictions are averaged — validating that the
speed-of-light path samples the same posterior the reference's tuned config
reaches (``DataRecords.txt:20,38``).
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

from gpt_tpu.data import load_power_plant
from gpt_tpu.experiments.configs import POWER_PLANT_TENSOR_SMALL as P
from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.inference import SGLDConfig
from gpt_tpu.inference.sgld import run_sgld_megafused
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams
from gpt_tpu.utils.records import append_record

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

C = int(sys.argv[1]) if len(sys.argv) > 1 else 64
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 200
AVG_LAST = 50

split = load_power_plant()
key = jax.random.PRNGKey(17)
kI, kf, kp, ks = jax.random.split(key, 4)
D = split.X_train.shape[1]
I = sample_core_indices(kI, P.r, D, P.Q)
rff = sample_tensor_rff(kf, P.n, D)
scale = tensor_phi_scale(P.n, P.Q, D)
phi = tensor_features(jnp.asarray(split.X_train, jnp.float32), rff,
                      P.length_scale, P.sigma_RBF, scale)
phi_test = tensor_features(jnp.asarray(split.X_test, jnp.float32), rff,
                           P.length_scale, P.sigma_RBF, scale)
y = jnp.asarray(split.y_train, jnp.float32)
y_test = jnp.asarray(split.y_test, jnp.float32)

model = TensorGP(n=P.n, r=P.r, D=D, I=I, signal_var=P.signal_var)
# adapt_eps: the headline eps is marginal at fleet scale (RECORDS
# `headline_config_marginality`); per-chain backoff keeps hot chains sane.
config = SGLDConfig(eps=TensorGPParams(w=P.epsw, U=P.epsU),
                    transport="polar", adapt_eps=True)
params0 = jax.vmap(model.init_params)(jax.random.split(kp, C))


def collect_predict(p):
    return jax.vmap(lambda q: model.predict(q, phi_test))(p)


t0 = time.time()
final, fhat, rej = run_sgld_megafused(
    model, params0, ks, phi, y, m=P.m, config=config,
    burnin=0, maxepoch=EPOCHS, collect_fn=collect_predict,
)
jax.block_until_ready(fhat)
wall = time.time() - t0

# fhat: (epochs, C, Ntest). Average over chains AND the last AVG_LAST epochs
# (the reference's averaged-prediction protocol, kin40kExperiment.jl:78-87),
# using only healthy chains (finite predictions throughout the window).
fh = np.asarray(fhat[-AVG_LAST:])
healthy = np.isfinite(fh).all(axis=(0, 2))  # (C,)
mean_pred = fh[:, healthy].mean(axis=(0, 1))
rmse_avg = float(split.y_std * np.sqrt(np.mean((mean_pred - np.asarray(y_test)) ** 2)))
# healthy chains only: nanmean would exclude NaN but pass inf through,
# making min_epoch_rmse inf whenever any chain diverges to inf
per_epoch = split.y_std * np.sqrt(
    np.mean((fh[:, healthy] - np.asarray(y_test)) ** 2, axis=(1, 2))
)
m = dict(
    chains=C, epochs=EPOCHS, avg_last=AVG_LAST,
    healthy_chains=int(healthy.sum()),
    avg_pred_rmse=round(rmse_avg, 4),
    min_epoch_rmse=round(float(np.nanmin(per_epoch)), 4),
    rejected=int(rej), seconds=round(wall, 1),
    reference_best=4.0732, reference_exact_gp=4.0056,
)
append_record(os.path.join(ROOT, "RECORDS.jsonl"), "pp_tensor_megafused_parity", m)
print(m, flush=True)
