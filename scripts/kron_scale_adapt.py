"""adapt_eps closes its motivating loop: the temperature-Kron scale run.

The original ``temperature_kron_synthetic_scale`` record (RECORDS.jsonl,
commit 8151814) showed the 400x720 / 100k-observation Kronecker workload
diverging at step size 1e-6 — 53,994 rejected transports, RMSE = inf — and
recovering only after hand-retuning to 1e-7. ``SGLDConfig.adapt_eps`` was
built to make exactly that self-recover (``sgld.py`` docstring cites this
run), but round 3 never re-ran the diverging config with adaptation on
(VERDICT r3 ask #5). This does: same scale, same ε=1e-6, ``adapt_eps=True``
→ expect bounded rejections and avg-pred RMSE at the ~0.1 noise floor with
no hand-retuning.

Writes RECORDS ``temperature_kron_synthetic_scale`` (config adapt_eps=true).
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

from gpt_tpu.experiments.kron import build_kron_problem, kron_eigen_factor, run_tensor2d_kron
from gpt_tpu.models.exact_gp import se_iso
from gpt_tpu.utils.records import append_record

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    n1, n2, n_obs, r = 400, 720, 100_000, 20
    noise = 0.1
    key = jax.random.PRNGKey(42)
    kd, kn, kr = jax.random.split(key, 3)

    grid1 = jnp.linspace(0.0, 4.0, n1)[:, None]
    grid2 = jnp.linspace(0.0, 6.0, n2)[:, None]
    k1, k2 = se_iso(0.3, 1.0), se_iso(0.3, 1.0)
    F1 = kron_eigen_factor(k1(grid1, grid1))
    F2 = kron_eigen_factor(k2(grid2, grid2))
    Z = jax.random.normal(kd, (n1, n2))
    Fgrid = F1 @ Z @ F2.T  # exact Kronecker GP prior draw, cov = K1 (x) K2

    rng = np.random.default_rng(7)
    flat = rng.choice(n1 * n2, size=n_obs, replace=False)
    i1, i2 = flat // n2, flat % n2
    y = np.asarray(Fgrid)[i1, i2] + noise * np.asarray(
        jax.random.normal(kn, (n_obs,)))
    prob = build_kron_problem(grid1, grid2, k1, k2, i1, i2, y)

    for adapt in (False, True):
        t0 = time.time()
        run = run_tensor2d_kron(
            prob, kr, r=r, signal_var=noise**2,
            epsw=1e-6, epsU=1e-6,  # the config that diverged in r2
            m=100, burnin=50, maxepoch=100, adapt_eps=adapt,
        )
        finite = np.isfinite(run.test_rmse)
        m = dict(
            n1=n1, n2=n2, n_obs=n_obs, r=r, epsw=1e-6, epsU=1e-6,
            adapt_eps=adapt,
            avg_pred_rmse=round(float(run.avg_pred_rmse), 4),
            min_epoch_rmse=(round(float(run.test_rmse[finite].min()), 4)
                            if finite.any() else float("inf")),
            noise_floor=noise,
            y_sd=round(float(np.std(y)), 3),
            rejected=run.rejected,
            seconds=round(time.time() - t0, 1),
        )
        append_record(os.path.join(ROOT, "RECORDS.jsonl"),
                      "temperature_kron_synthetic_scale", m)
        print(m, flush=True)


if __name__ == "__main__":
    main()
