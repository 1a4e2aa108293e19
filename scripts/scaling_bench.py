"""Chain-scaling benchmark → SCALING.md.

Two studies (BASELINE.json's scaling-efficiency report):

1. **Chains per chip** (run on the TPU): SGLD samples/s at increasing vmapped
   chain counts — the single-chip throughput curve behind the headline bench.
2. **Devices** (virtual CPU mesh, ``--cpu-mesh``): samples/s with chains
   sharded over 1/2/4/8 mesh devices at fixed chains-per-device — the
   multi-host chain-scaling-efficiency proxy available without a pod slice
   (the driver's ``dryrun_multichip`` validates the same path compiles for
   real meshes).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPU_MESH = "--cpu-mesh" in sys.argv

if CPU_MESH:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if CPU_MESH:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

from gpt_tpu.data import load_power_plant
from gpt_tpu.experiments.configs import POWER_PLANT_TENSOR_SMALL as PRESET
from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.inference import SGLDConfig, run_sgld_chains_fused
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams
from gpt_tpu.utils.records import append_record

RECORDS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "RECORDS.jsonl")


def setup():
    split = load_power_plant()
    key = jax.random.PRNGKey(17)
    kI, kf = jax.random.split(key)
    D = split.X_train.shape[1]
    I = sample_core_indices(kI, PRESET.r, D, PRESET.Q)
    rff = sample_tensor_rff(kf, PRESET.n, D)
    phi = tensor_features(
        jnp.asarray(split.X_train, jnp.float32), rff,
        PRESET.length_scale, PRESET.sigma_RBF,
        tensor_phi_scale(PRESET.n, PRESET.Q, D),
    )
    y = jnp.asarray(split.y_train, jnp.float32)
    model = TensorGP(n=PRESET.n, r=PRESET.r, D=D, I=I, signal_var=PRESET.signal_var)
    return model, phi, y


def chains_per_device_study(model, phi, y, counts, epochs=5):
    cfg = SGLDConfig(eps=TensorGPParams(w=PRESET.epsw, U=PRESET.epsU), transport="polar")
    B = -(-y.shape[0] // PRESET.m)
    out = {}
    for Cn in counts:
        params0 = jax.vmap(model.init_params)(
            jax.random.split(jax.random.PRNGKey(1), Cn))
        keys = jax.random.PRNGKey(2)
        run = lambda: run_sgld_chains_fused(
            model, params0, keys, phi, y, m=PRESET.m, config=cfg,
            burnin=epochs, maxepoch=0, collect_fn=lambda p: ())
        jax.block_until_ready(run()[0].params.w)
        t0 = time.perf_counter()
        finals, _ = run()
        jax.block_until_ready(finals.params.w)
        dt = time.perf_counter() - t0
        sps = Cn * B * epochs / dt
        out[Cn] = sps
        append_record(RECORDS, "scaling_chains", {"chains": Cn, "samples_per_s": sps, "seconds": dt})
        print(f"chains={Cn}: {sps:.0f} samples/s", flush=True)
    return out


def device_study(model, phi, y, epochs=3):
    from gpt_tpu.inference.sgld import SGLDConfig as SC
    from gpt_tpu.parallel import make_mesh
    from gpt_tpu.parallel.chains import run_sharded_chains

    cfg = SC(eps=TensorGPParams(w=PRESET.epsw, U=PRESET.epsU), transport="polar")
    B = -(-y.shape[0] // PRESET.m)
    chains_per_dev = 4
    out = {}
    for ndev in [1, 2, 4, 8]:
        if ndev > len(jax.devices()):
            continue
        mesh = make_mesh(chain=ndev, data=1, devices=jax.devices()[:ndev])
        Cn = chains_per_dev * ndev
        run = lambda: run_sharded_chains(
            model, mesh, jax.random.PRNGKey(3), phi, y,
            num_chains=Cn, m=PRESET.m, config=cfg,
            burnin=epochs, maxepoch=0, collect_fn=lambda p: ())
        jax.block_until_ready(run()[0].params.w)
        t0 = time.perf_counter()
        finals, _ = run()
        jax.block_until_ready(finals.params.w)
        dt = time.perf_counter() - t0
        sps = Cn * B * epochs / dt
        out[ndev] = sps
        append_record(RECORDS, "scaling_devices", {"devices": ndev, "chains": Cn, "samples_per_s": sps})
        print(f"devices={ndev} (chains={Cn}): {sps:.0f} samples/s", flush=True)
    return out


def main():
    model, phi, y = setup()
    lines = ["# SCALING — chain/device scaling of tensor-GP SGLD", ""]
    if CPU_MESH:
        dv = device_study(model, phi, y)
        base = dv.get(1)
        lines += ["## Devices (virtual 8-device CPU mesh, 4 chains/device)", "",
                  "| devices | samples/s | efficiency |", "|---|---|---|"]
        for nd, sps in dv.items():
            eff = sps / (base * nd) if base else float("nan")
            lines.append(f"| {nd} | {sps:.0f} | {100*eff:.0f}% |")
    else:
        cs = chains_per_device_study(model, phi, y, [1, 64, 256, 1024, 4096, 8192])
        base = cs.get(1)
        lines += [f"## Chains on one {jax.devices()[0].device_kind}", "",
                  "| chains | samples/s | vs 1-chain × C |", "|---|---|---|"]
        for Cn, sps in cs.items():
            lines.append(f"| {Cn} | {sps:.0f} | {100*sps/(base*Cn):.0f}% |")
    mode = "devices" if CPU_MESH else "chains"
    path = os.path.join(os.path.dirname(RECORDS), f"SCALING_{mode}.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
