"""Megafused-kernel probe harness — the round-3 debugging campaign's one-off
``mf_*`` scripts consolidated into stages (VERDICT r3 Weak #7).

    python scripts/mf_probe.py --stage=timing     # step timing + stage bisect
    python scripts/mf_probe.py --stage=stability  # long-run health vs XLA path
    python scripts/mf_probe.py --stage=overhead   # pallas-in-scan dispatch cost
    python scripts/mf_probe.py --stage=precision  # HIGHEST honored in-kernel?

Correctness probes (NaN containment, deterministic XLA parity, adapt-eps
recovery) are PERMANENT tests, not probes — see ``tests/test_pallas_sgld.py``.
Everything here goes through ``run_sgld_megafused``'s public surface (the
``stages`` bisect hook), so kernel-signature changes can't strand it the way
they stranded the old direct-``fused_sgld_step`` probes.
"""
import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np


def _pp_setup(C):
    from gpt_tpu.data import load_power_plant
    from gpt_tpu.experiments.configs import POWER_PLANT_TENSOR_SMALL as P
    from gpt_tpu.features import (sample_tensor_rff, tensor_features,
                                  tensor_phi_scale)
    from gpt_tpu.models import TensorGP, sample_core_indices

    split = load_power_plant()
    key = jax.random.PRNGKey(17)
    kI, kf, kp, ks = jax.random.split(key, 4)
    D = split.X_train.shape[1]
    I = sample_core_indices(kI, P.r, D, P.Q)
    rff = sample_tensor_rff(kf, P.n, D)
    phi = tensor_features(jnp.asarray(split.X_train, jnp.float32), rff,
                          P.length_scale, P.sigma_RBF,
                          tensor_phi_scale(P.n, P.Q, D))
    y = jnp.asarray(split.y_train, jnp.float32)
    model = TensorGP(n=P.n, r=P.r, D=D, I=I, signal_var=P.signal_var)
    params0 = jax.vmap(model.init_params)(jax.random.split(kp, C))
    return P, model, params0, phi, y, ks


def stage_timing(args):
    """Step timing at (C, CB) points + cumulative stage bisect.

    Bisect uses run_sgld_megafused's ``stages`` hook: dropping "manifold",
    then "bwd", then "expand" isolates where the per-step time goes."""
    from gpt_tpu.experiments.configs import POWER_PLANT_TENSOR_SMALL as P
    from gpt_tpu.inference import SGLDConfig
    from gpt_tpu.inference.sgld import collect_nothing, run_sgld_megafused
    from gpt_tpu.models.tensor_gp import TensorGPParams

    epochs = 10
    for C, CB in [(256, 16), (1024, 16), (4096, 16), (4096, 8)]:
        _, model, params0, phi, y, ks = _pp_setup(C)
        cfg = SGLDConfig(eps=TensorGPParams(w=P.epsw, U=P.epsU),
                         transport="polar")
        for stages in (("expand", "bwd", "manifold"), ("expand", "bwd"),
                       ("expand",), ()):
            run = partial(
                run_sgld_megafused, model, params0, ks, phi, y, m=P.m,
                config=cfg, burnin=epochs, maxepoch=0,
                collect_fn=collect_nothing, chain_block=CB, stages=stages,
            )
            jax.block_until_ready(run()[0].w)  # warm
            t0 = time.perf_counter()
            jax.block_until_ready(run()[0].w)
            dt = time.perf_counter() - t0
            steps = C * epochs * (-(-y.shape[0] // P.m))
            print(f"C={C} CB={CB} stages={'+'.join(stages) or 'none'}: "
                  f"{steps / dt:,.0f} chain-steps/s", flush=True)


def stage_stability(args):
    """Long-run health: megafused vs XLA fused runner on the PP headline."""
    from gpt_tpu.experiments.configs import POWER_PLANT_TENSOR_SMALL as P
    from gpt_tpu.inference import SGLDConfig
    from gpt_tpu.inference.sgld import (collect_nothing, run_sgld_chains_fused,
                                        run_sgld_megafused)
    from gpt_tpu.models.tensor_gp import TensorGPParams

    C, epochs = 256, args.epochs
    _, model, params0, phi, y, ks = _pp_setup(C)
    cfg = SGLDConfig(eps=TensorGPParams(w=P.epsw, U=P.epsU), transport="polar")

    def health(tag, params, rej):
        w_ok = np.asarray(jnp.all(jnp.isfinite(params.w), axis=-1))
        UtU = jnp.einsum("cdni,cdnj->cdij", params.U, params.U,
                         precision=jax.lax.Precision.HIGHEST)
        orth = np.asarray(jnp.max(jnp.abs(
            UtU - jnp.eye(model.r)), axis=(-3, -2, -1)))
        print(f"{tag}: rejected={int(rej)} finite={int(w_ok.sum())}/{C} "
              f"max_orth_err={orth[w_ok].max():.2e}", flush=True)

    final, _, rej = run_sgld_megafused(
        model, params0, ks, phi, y, m=P.m, config=cfg, burnin=epochs,
        maxepoch=0, collect_fn=collect_nothing)
    health("megafused", final, rej)
    final2, _ = run_sgld_chains_fused(
        model, params0, ks, phi, y, m=P.m, config=cfg, burnin=epochs,
        maxepoch=0, collect_fn=lambda p: ())
    health("xla-fused", final2[0].params, final2[0].rejected.sum())


def stage_overhead(args):
    """Per-iteration overhead of a pallas_call inside lax.scan vs pure XLA."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    iters = 2000

    @jax.jit
    def scan_pallas(x):
        def body(c, _):
            return pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct(c.shape, c.dtype),
                interpret=jax.default_backend() != "tpu")(c), ()
        return jax.lax.scan(body, x, None, length=iters)[0]

    @jax.jit
    def scan_xla(x):
        return jax.lax.scan(lambda c, _: (c + 1.0, ()), x, None,
                            length=iters)[0]

    for name, fn in [("pallas", scan_pallas), ("xla", scan_xla)]:
        jax.block_until_ready(fn(x))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        dt = time.perf_counter() - t0
        print(f"{name}-in-scan: {dt / iters * 1e6:.2f} us/iter", flush=True)


def stage_precision(args):
    """Does an in-kernel f32 dot honor precision=HIGHEST? X^T X vs f64."""
    from jax.experimental import pallas as pl

    n, r = 150, 20
    X = np.linalg.qr(np.random.default_rng(0).normal(size=(n, r)))[0]
    X = X.astype(np.float32)
    ref = (X.astype(np.float64).T @ X.astype(np.float64))

    for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT):
        def kern(x_ref, o_ref, prec=prec):
            x = x_ref[...]
            o_ref[...] = jax.lax.dot_general(
                x, x, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)

        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((r, r), jnp.float32),
            interpret=jax.default_backend() != "tpu")(jnp.asarray(X))
        err = float(np.abs(np.asarray(out, np.float64) - ref).max())
        print(f"pallas dot {prec}: max|err| vs f64 = {err:.2e}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True,
                    choices=["timing", "stability", "overhead", "precision"])
    ap.add_argument("--epochs", type=int, default=10)
    args = ap.parse_args()
    dict(timing=stage_timing, stability=stage_stability,
         overhead=stage_overhead, precision=stage_precision)[args.stage](args)


if __name__ == "__main__":
    main()
