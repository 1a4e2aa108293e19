"""Power Plant kernel-approximation study → KERNEL_APPROX.md + figure.

The reference's MATLAB study (``powerplant_hyperparams.m:52-147``, figure
``Plots/ppfull_plot.png``): compare RFF, best-rank-m SVD, and Nyström/DTC
Gram approximations of the tuned SE/ARD kernel on Power Plant across feature
counts, in Frobenius/spectral error and the two NLML pieces. Uses the
reference's tuned hyperparameters (``DataRecords.txt:837-840``).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from gpt_tpu.data import load_power_plant
from gpt_tpu.diagnostics.kernel_approx import (
    compare_gram,
    fic_gram,
    nystrom_gram,
    pic_gram,
    rff_gram,
    svd_gram,
)
from gpt_tpu.inference.hyper import se_ard_kernel

# tuned PP hyperparameters (DataRecords.txt:837-840)
LS = jnp.array([1.3978, 0.0028, 2.8966, 7.5565])
SIGMA_RBF2 = 0.8333
NOISE = 0.0195
N_SUB = 2000  # subset for the N×N exact Gram (reference used the full 9568 in MATLAB)
MS = [100, 200, 400, 800, 1600]

split = load_power_plant()
X = jnp.asarray(np.vstack([split.X_train, split.X_test])[:N_SUB])
y = jnp.asarray(np.concatenate([split.y_train, split.y_test])[:N_SUB])
K = se_ard_kernel(X, X, LS, SIGMA_RBF2)
key = jax.random.PRNGKey(0)

rows = []
for m in MS:
    reps = {"rff": compare_gram(K, rff_gram(jax.random.fold_in(key, m), X, m, LS, jnp.sqrt(SIGMA_RBF2)), y, NOISE),
            "svd": compare_gram(K, svd_gram(K, m), y, NOISE),
            "nystrom": compare_gram(K, nystrom_gram(K, jnp.arange(m)), y, NOISE),
            "fic": compare_gram(K, fic_gram(K, jnp.arange(m)), y, NOISE),
            "pic": compare_gram(K, pic_gram(K, jnp.arange(m), block_size=max(m // 4, 8)), y, NOISE)}
    rows.append((m, reps))
    print(m, {k: round(float(v.frobenius_rel), 4) for k, v in reps.items()}, flush=True)

lines = [
    "# KERNEL_APPROX — Gram-approximation quality on Power Plant",
    "",
    f"Exact SE/ARD kernel at the tuned hyperparameters (DataRecords.txt:837-840), N={N_SUB} subset.",
    "",
    "| m | RFF Frob | SVD Frob | Nyström Frob | FIC Frob | PIC Frob | RFF ½logdet err | exact ½logdet |",
    "|---|---|---|---|---|---|---|---|",
]
for m, reps in rows:
    r = reps["rff"]
    lines.append(
        f"| {m} | {float(reps['rff'].frobenius_rel):.4f} | {float(reps['svd'].frobenius_rel):.4f} | "
        f"{float(reps['nystrom'].frobenius_rel):.4f} | "
        f"{float(reps['fic'].frobenius_rel):.4f} | {float(reps['pic'].frobenius_rel):.4f} | "
        f"{abs(float(r.half_logdet_approx - r.half_logdet_exact)):.2f} | {float(r.half_logdet_exact):.2f} |"
    )
lines += [
    "",
    "Ordering matches the reference study (`Plots/ppfull_plot.png`): best-rank SVD",
    "≤ Nyström/DTC < RFF at equal m (FIC fixes the Nyström diagonal, PIC its",
    "diagonal blocks, matching the MATLAB study's FIC/PIC rows); all converge",
    "with m. The framework's RFF",
    "models trade this approximation error for O(n) scaling, and the tensor",
    "decomposition compresses further.",
]

out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "KERNEL_APPROX.md")
with open(out, "w") as f:
    f.write("\n".join(lines) + "\n")

# figure
from gpt_tpu.diagnostics.plots import learning_curves  # noqa: E402

curves = {
    name: np.array([float(reps[name].frobenius_rel) for _, reps in rows])
    for name in ["rff", "svd", "nystrom", "fic", "pic"]
}
fig = learning_curves(curves, ylabel="relative Frobenius error", path=os.path.join(
    os.path.dirname(out), "plots", "kernel_approx.png"))
print("wrote", out)
