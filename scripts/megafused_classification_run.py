"""Megafused classification on the real segment dataset → RECORDS.

The r3 ask #6 "Done" criterion: a megafused classification RUN (not just a
parity test). Drives the UCI image-segmentation workload
(``ImageExperiment.jl`` family) through ``run_sgld_megafused`` with
(chain, class) super-chains on the TPU, in both factor modes:

- the honest Stiefel config (n=20, r=5 — PARITY.md's tensor-classification
  row: best error 0.088), and
- the reference's LITERAL n=5, r=10 shape (r > n ⇒ Euclidean factors).

Reports best / MC-averaged error across a chain fleet vs the XLA-path
numbers. Writes RECORDS ``megafused_classification``.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from gpt_tpu.data import load_segment
from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.inference import SGLDConfig
from gpt_tpu.inference.sgld import run_sgld_megafused
from gpt_tpu.models import sample_core_indices
from gpt_tpu.models.classification import TensorClassParams, TensorGPClassifier
from gpt_tpu.utils.records import append_record

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(tag, n, r, Q, epsw, epsU, C=16, epochs=100, dc=25,
            loo_bf16=None):
    split = load_segment()
    key = jax.random.PRNGKey(17)
    kI, kf, kp, ks = jax.random.split(key, 4)
    D = split.X_train.shape[1]
    I = sample_core_indices(kI, r, D, Q)
    rff = sample_tensor_rff(kf, n, D)
    scale = tensor_phi_scale(n, Q, D)
    phi_tr = tensor_features(jnp.asarray(split.X_train, jnp.float32), rff, 1.0, 1.0, scale)
    phi_te = tensor_features(jnp.asarray(split.X_test, jnp.float32), rff, 1.0, 1.0, scale)
    y_tr = jnp.asarray(split.y_train, jnp.float32)

    stiefel = r <= n
    model = TensorGPClassifier(n=n, r=r, D=D, num_classes=split.num_classes,
                               I=I, stiefel=stiefel)
    params0 = jax.vmap(model.init_params)(jax.random.split(kp, C))
    cfg = SGLDConfig(eps=TensorClassParams(w=epsw, U=epsU), transport="polar")

    def collect(p):
        return model.predict_proba(p, phi_te)  # (C, Ntest, ncls)

    t0 = time.time()
    final, probs, rej = run_sgld_megafused(
        model, params0, ks, phi_tr, y_tr, m=50, config=cfg,
        burnin=epochs // 2, maxepoch=epochs // 2, collect_fn=collect,
        chain_block=split.num_classes, data_chunk=dc, loo_bf16=loo_bf16,
    )
    jax.block_until_ready(probs)
    wall = time.time() - t0
    y_te = np.asarray(split.y_test)
    pr = np.asarray(probs)  # (kept, C, Ntest, ncls)
    per = (pr.argmax(-1) != y_te[None, None]).mean(-1)       # (kept, C)
    avg = (pr.mean(axis=(0, 1)).argmax(-1) != y_te).mean()   # MC-avg over fleet
    m = dict(
        config=tag, n=n, r=r, Q=Q, stiefel=stiefel, chains=C, epochs=epochs,
        best_err=round(float(per.min()), 4),
        mc_avg_err=round(float(avg), 4),
        rejected=int(rej), seconds=round(wall, 1),
        chance=round(1 - 1 / split.num_classes, 3),
        xla_path_reference="PARITY.md: 0.088 best / 0.099 MC-avg (n=20, r=5)",
    )
    append_record(os.path.join(ROOT, "RECORDS.jsonl"), "megafused_classification", m)
    print(m, flush=True)


def main():
    # Q=200 — the reference's LITERAL capacity (ImageExperiment.jl:18),
    # closing the r4 gap where the in-kernel path capped at Q=100: the r5
    # kernel drops the separate ohb buffer (backward contracts ohf
    # transposed) and holds the D retained g_d / suffix products in bf16
    # (loo_bf16), halving the VMEM working set that used to overflow at
    # CB=7, D=19, Q=200.
    run_one("honest stiefel", n=20, r=5, Q=200, epsw=1e-4, epsU=1e-6,
            epochs=400, loo_bf16=True)
    run_one("literal ImageExperiment (r>n, euclidean)", n=5, r=10, Q=200,
            epsw=1e-4, epsU=1e-5, epochs=400, loo_bf16=True)


if __name__ == "__main__":
    main()
