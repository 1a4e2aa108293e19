"""Kernel-approximation quality study (L7).

Capability parity with the MATLAB study ``powerplant_hyperparams.m:52-147``
and the in-script check at ``PowerPlantDataExperiment.jl:88-95``: compare an
approximate Gram matrix (RFF, truncated-SVD, or Nyström/DTC) against the
exact SE/ARD kernel via Frobenius and spectral error, and compare the two
NLML pieces (log-determinant and data inner product) that those errors drive.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpt_tpu.features import full_features, sample_full_rff
from gpt_tpu.inference.hyper import se_ard_kernel


class ApproxReport(NamedTuple):
    frobenius_rel: jnp.ndarray
    spectral_rel: jnp.ndarray
    half_logdet_exact: jnp.ndarray
    half_logdet_approx: jnp.ndarray
    half_innerprod_exact: jnp.ndarray
    half_innerprod_approx: jnp.ndarray


def _nlml_pieces(K, y, signal_var):
    N = y.shape[0]
    A = K + signal_var * jnp.eye(N, dtype=K.dtype)
    L = jnp.linalg.cholesky(A)
    half_logdet = jnp.sum(jnp.log(jnp.diag(L)))
    alpha = jax.scipy.linalg.cho_solve((L, True), y)
    return half_logdet, 0.5 * jnp.dot(y, alpha)


def compare_gram(K_exact: jnp.ndarray, K_approx: jnp.ndarray, y: jnp.ndarray,
                 signal_var) -> ApproxReport:
    diff = K_approx - K_exact
    fro = jnp.linalg.norm(diff) / jnp.linalg.norm(K_exact)
    spec = jnp.linalg.norm(diff, ord=2) / jnp.linalg.norm(K_exact, ord=2)
    ld_e, ip_e = _nlml_pieces(K_exact, y, signal_var)
    ld_a, ip_a = _nlml_pieces(K_approx, y, signal_var)
    return ApproxReport(fro, spec, ld_e, ld_a, ip_e, ip_a)


def rff_gram(key: jax.Array, X: jnp.ndarray, m: int, length_scale, sigma_RBF) -> jnp.ndarray:
    """RFF approximate Gram with m features (``SEard_RFF1.m`` construction)."""
    phi = full_features(X, sample_full_rff(key, m, X.shape[1], dtype=X.dtype),
                        length_scale, sigma_RBF)
    return phi @ phi.T


def svd_gram(K: jnp.ndarray, m: int) -> jnp.ndarray:
    """Best rank-m approximation (the study's SVD row)."""
    vals, vecs = jnp.linalg.eigh(K)
    vals_t = jnp.where(jnp.arange(K.shape[0]) >= K.shape[0] - m, vals, 0.0)
    return (vecs * vals_t[None, :]) @ vecs.T


def nystrom_gram(K: jnp.ndarray, idx: jnp.ndarray, jitter: float = 1e-8) -> jnp.ndarray:
    """Nyström/DTC approximation with inducing rows ``idx``
    (the study's naive-DTC row, ``powerplant_hyperparams.m``)."""
    Kmm = K[jnp.ix_(idx, idx)] + jitter * jnp.eye(idx.shape[0], dtype=K.dtype)
    Knm = K[:, idx]
    L = jnp.linalg.cholesky(Kmm)
    V = jax.scipy.linalg.solve_triangular(L, Knm.T, lower=True)
    return V.T @ V


def fic_gram(K: jnp.ndarray, idx: jnp.ndarray, jitter: float = 1e-8) -> jnp.ndarray:
    """FIC: Nyström plus exact-diagonal correction
    (``powerplant_hyperparams.m``'s FIC row)."""
    Q = nystrom_gram(K, idx, jitter)
    return Q + jnp.diag(jnp.diagonal(K) - jnp.diagonal(Q))


def block_diag_extract(K: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """Zero everything outside contiguous diagonal blocks — the reference's
    ``blockdiag.m:1-8`` helper, as one masked elementwise op."""
    N = K.shape[0]
    blk = jnp.arange(N) // block_size
    mask = (blk[:, None] == blk[None, :]).astype(K.dtype)
    return K * mask


def pic_gram(K: jnp.ndarray, idx: jnp.ndarray, block_size: int,
             jitter: float = 1e-8) -> jnp.ndarray:
    """PIC: Nyström corrected with the exact residual on diagonal blocks
    (``powerplant_hyperparams.m``'s PIC row, built on ``blockdiag.m``)."""
    Q = nystrom_gram(K, idx, jitter)
    return Q + block_diag_extract(K - Q, block_size)


def rff_convergence_study(
    key: jax.Array,
    X: jnp.ndarray,
    y: jnp.ndarray,
    length_scale,
    sigma_RBF,
    signal_var,
    ms: tuple[int, ...] = (100, 200, 400, 800, 1600, 3200),
    num_seeds: int = 3,
) -> dict:
    """Frobenius/spectral error of the RFF Gram vs feature count, averaged
    over seeds — the assertion-ready form of ``powerplant_hyperparams.m``'s
    panels. Returns {m: (mean fro, mean spec)}."""
    K = se_ard_kernel(X, X, length_scale, sigma_RBF**2)
    out = {}
    for m in ms:
        fros, specs = [], []
        for s in range(num_seeds):
            Ka = rff_gram(jax.random.fold_in(key, m * 131 + s), X, m, length_scale, sigma_RBF)
            rep = compare_gram(K, Ka, y, signal_var)
            fros.append(rep.frobenius_rel)
            specs.append(rep.spectral_rel)
        out[m] = (float(jnp.mean(jnp.stack(fros))), float(jnp.mean(jnp.stack(specs))))
    return out
