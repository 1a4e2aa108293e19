"""Headline benchmark: tensor-GP SGLD samples/s on one chip, vmapped chains.

Workload: the reference's Power Plant tensor SGLD config (n=100, r=10, Q=100,
m=100, Ntrain=5000 — ``DataRecords.txt:20``), which the reference runs at
3 s/epoch = 50 minibatch steps / 3 s ≈ 16.7 steps/s on its CPU cluster, one
chain at a time. Here many chains run vmapped in one fused XLA program; the
metric is total chain-steps/s (posterior samples/s across chains, the
BASELINE.json scaling metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/s", "vs_baseline": N}
"""
from __future__ import annotations

import json
import time


REFERENCE_STEPS_PER_SEC = 50 / 3.0  # DataRecords.txt:20 — 3 s/epoch, 50 batches


def main():
    import os

    # SGLD-sanctioned fast path (utils/stiefel.py module docs): transport
    # algebra at DEFAULT matmul precision — the per-step Newton–Schulz polar
    # correction stays HIGHEST and wipes any projection drift, so manifold
    # adherence is unchanged (asserted below) while the tiny batched
    # HIGHEST einsums stop costing ~10% of the step (630k -> 699k measured).
    # MH-exact samplers (GMC) must NOT inherit this — bench-local env only.
    os.environ.setdefault("GPT_TPU_STIEFEL_PRECISION", "default")
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

    from functools import partial

    from gpt_tpu.data import load_power_plant
    from gpt_tpu.experiments.configs import POWER_PLANT_TENSOR_SMALL as PRESET
    from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
    from gpt_tpu.inference import SGLDConfig, run_sgld
    from gpt_tpu.models import TensorGP, sample_core_indices
    from gpt_tpu.models.tensor_gp import TensorGPParams

    # 256 fused chains is the single-chip throughput peak of the XLA path:
    # the whole fleet's params + step state stay VMEM-resident; ≥384 chains
    # fall off a residency cliff, where run_sgld_auto dispatches to the
    # megafused Pallas kernel instead (SCALING_chains.md has the envelope;
    # the bench reports the envelope's peak point).
    num_chains = 256
    epochs_timed = 25

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

    model = TensorGP(n=PRESET.n, r=PRESET.r, D=D, I=I, signal_var=PRESET.signal_var)
    # polar transport (matmul-only retraction) + fused chain batching:
    # measured 2.9x over the cayley+vmap path (scripts/fused_bench.py) — the
    # cayley 2r x 2r batched LU solve alone cost ~6 ms/step on TPU v5e.
    # epsw = 5e-5, NOT the preset's 1e-4: the preset is marginal (~5% of
    # chains diverge within the bench window — 49.6k rejections — RECORDS
    # headline_config_marginality), and samples/s from diverged chains
    # aren't posterior samples. 5e-5 measures 0 rejections at the same
    # throughput (632k vs 629k measured in the r4 stable-eps probe).
    config = SGLDConfig(
        eps=TensorGPParams(w=5e-5, U=PRESET.epsU), transport="polar"
    )
    params0 = jax.vmap(model.init_params)(jax.random.split(kp, num_chains))

    # jit constructed ONCE and reused — the steady-state regime of any real
    # sampling loop. (Re-wrapping per call would re-trace the whole scan
    # program each invocation and bill ~1-2 s of host tracing to the chip.)
    run = jax.jit(partial(
        run_sgld, model, phi=phi, y=y,
        m=PRESET.m, config=config, burnin=epochs_timed, maxepoch=0,
        collect_fn=lambda p: (),
    ))

    # Warmup/compile with the same trace shape as the timed run.
    jax.block_until_ready(run(params0, ks)[0].params.w)
    # best-of-3: single-shot timings through the tunnelled chip vary ~10%
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        finals, _ = run(params0, ks)
        jax.block_until_ready(finals.params.w)
        dt = min(dt, time.perf_counter() - t0)

    total_steps = num_chains * num_batches * epochs_timed
    samples_per_sec = total_steps / dt
    # The bench config is stable BY CONSTRUCTION (see epsw above): every
    # chain must finish healthy and zero transports may be rejected —
    # otherwise the throughput number partially counts rejected-step work.
    w_ok = jnp.all(jnp.isfinite(finals.params.w), axis=-1)
    UtU = jnp.einsum("cdni,cdnj->cdij", finals.params.U, finals.params.U)
    orth_err = jnp.max(
        jnp.abs(UtU - jnp.eye(PRESET.r, dtype=UtU.dtype)), axis=(-3, -2, -1)
    )
    num_bad = int(jnp.sum(~w_ok | ~(orth_err < 1e-2)))
    rejected = int(finals.rejected)
    assert num_bad == 0, f"{num_bad}/{num_chains} chains diverged"
    assert rejected == 0, f"{rejected} rejected transports in the bench window"

    # The effective config rides along so cross-round comparisons under the
    # same metric key stay honest: eps_w is the hand-picked stable 5e-5 (NOT
    # the preset's marginal 1e-4) and transport algebra runs at DEFAULT
    # precision since r4 (earlier rounds: preset eps, HIGHEST).
    print(json.dumps({
        "metric": "tensor-GP SGLD chain-steps/s (PP n=100 r=10 Q=100 m=100, 256 chains, 1 chip)",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / REFERENCE_STEPS_PER_SEC, 1),
        "config": {
            "eps_w": 5e-5,
            "eps_U": PRESET.epsU,
            "transport": "polar",
            "stiefel_precision": os.environ["GPT_TPU_STIEFEL_PRECISION"],
            "chains": num_chains,
            "epochs_timed": epochs_timed,
        },
    }))


if __name__ == "__main__":
    main()
