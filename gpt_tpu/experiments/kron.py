"""Kronecker-structured 2-D experiments: UK temperature / California housing (L5).

Capability parity with the reference's Kronecker pipeline:

- ``generate_temp_rda.m:12-18`` — build per-axis SE Gram matrices over the
  spatial/temporal grids, eigendecompose, and use ``Φ = V·√Λ`` rows (indexed
  by grid cell) as exact Kronecker features with ``Φ Φᵀ = K``;
- ``temperature_uk/tensor2d_kron.stan`` + ``.r`` — low-rank Tensor2D posterior
  over those features (Stan NUTS there; SGLD / adaptive HMC here);
- ``california/tensor2d.r`` — the RFF variant for scattered 2-D data
  (lat/long), gated on the presence of ``cadata.txt`` (gitignored in the
  reference checkout too).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gpt_tpu.experiments.regression import RegressionRun
from gpt_tpu.inference import SGLDConfig, run_sgld
from gpt_tpu.models import Tensor2D, gather_features
from gpt_tpu.models.kron2d import Tensor2DParams


def kron_eigen_factor(K: jnp.ndarray, jitter: float = 1e-10) -> jnp.ndarray:
    """Eigenfactor Φ with ``Φ Φᵀ = K`` (``generate_temp_rda.m:12-18``:
    ``phiU = V*sqrt(D)``). Eigenvalues clipped at 0 for PSD safety."""
    vals, vecs = jnp.linalg.eigh(K)
    return vecs * jnp.sqrt(jnp.maximum(vals, jitter))[None, :]


class KronProblem(NamedTuple):
    """A gridded 2-axis regression problem in Kronecker form."""

    factor1: jnp.ndarray  # (n1, n1) eigenfactor of axis-1 Gram
    factor2: jnp.ndarray  # (n2, n2)
    ind1_train: jnp.ndarray
    ind2_train: jnp.ndarray
    y_train: jnp.ndarray
    ind1_test: jnp.ndarray
    ind2_test: jnp.ndarray
    y_test: jnp.ndarray


def build_kron_problem(
    grid1: jnp.ndarray,  # (n1, d1) axis-1 locations (e.g. station coords)
    grid2: jnp.ndarray,  # (n2, d2) axis-2 locations (e.g. times)
    kernel1: Callable,
    kernel2: Callable,
    ind1: np.ndarray,
    ind2: np.ndarray,
    y: np.ndarray,
    *,
    train_frac: float = 0.9,
    seed: int = 0,
) -> KronProblem:
    """Assemble factors + a random train/test split of the observations."""
    f1 = kron_eigen_factor(kernel1(grid1, grid1))
    f2 = kron_eigen_factor(kernel2(grid2, grid2))
    rng = np.random.default_rng(seed)
    N = len(y)
    perm = rng.permutation(N)
    ntr = int(train_frac * N)
    tr, te = perm[:ntr], perm[ntr:]
    asi = lambda a, idx: jnp.asarray(np.asarray(a)[idx])
    return KronProblem(
        factor1=f1, factor2=f2,
        ind1_train=asi(ind1, tr).astype(jnp.int32), ind2_train=asi(ind2, tr).astype(jnp.int32),
        y_train=asi(y, tr).astype(f1.dtype),
        ind1_test=asi(ind1, te).astype(jnp.int32), ind2_test=asi(ind2, te).astype(jnp.int32),
        y_test=asi(y, te).astype(f1.dtype),
    )


def run_tensor2d_kron(
    problem: KronProblem,
    key: jax.Array,
    *,
    r: int,
    signal_var: float,
    epsw: float = 1e-4,
    epsU: float = 1e-4,
    m: int = 100,
    burnin: int = 50,
    maxepoch: int = 100,
    adapt_eps: bool = False,
) -> RegressionRun:
    """SGLD on the Tensor2D model over indexed Kronecker features.

    The Stan workload of ``temperature_uk/tensor2d_kron.stan`` with the NUTS
    engine swapped for the sampler suite (use ``inference.hmc`` for the
    gold-standard variant).
    """
    n1, n2 = problem.factor1.shape[0], problem.factor2.shape[0]
    model = Tensor2D(n1=n1, n2=n2, r=r, signal_var=signal_var)
    kp, ks = jax.random.split(key)
    params0 = model.init_params(kp, dtype=problem.factor1.dtype)

    phi_train = (
        gather_features(problem.factor1, problem.ind1_train),
        gather_features(problem.factor2, problem.ind2_train),
    )
    phi_test = (
        gather_features(problem.factor1, problem.ind1_test),
        gather_features(problem.factor2, problem.ind2_test),
    )
    # adapt_eps: the cross-chain/step backoff that auto-recovers configs like
    # the temperature-scale run that logged 53,994 rejections and RMSE=inf at
    # PP-size step sizes before hand-retuning (RECORDS.jsonl
    # temperature_kron_synthetic_scale) — see SGLDConfig.adapt_eps.
    cfg = SGLDConfig(eps=Tensor2DParams(U=epsU, V=epsU, w=epsw),
                     adapt_eps=adapt_eps)
    collect = lambda p: model.predict(p, phi_test)
    final, fhat = run_sgld(
        model, params0, ks, phi_train, problem.y_train,
        m=m, config=cfg, burnin=burnin, maxepoch=maxepoch, collect_fn=collect,
    )
    err = fhat - problem.y_test[None, :]
    per_epoch = jnp.sqrt(jnp.mean(err**2, axis=-1))
    mean_pred = jnp.mean(fhat, axis=0)
    avg_rmse = float(jnp.sqrt(jnp.mean((mean_pred - problem.y_test) ** 2)))
    return RegressionRun(
        test_rmse=np.asarray(per_epoch),
        avg_pred_rmse=avg_rmse,
        final_params=final.params,
        rejected=int(np.asarray(final.rejected)),
    )


def load_california(path: str = "/root/reference/california/cadata.txt",
                    n_train: int = 10320):
    """California housing (20640 rows) exactly as ``california/tensor2d.r``:
    log-price target, (lat, long) inputs, rows reordered by the canonical
    permutation from ``california/permutation.mat`` (which IS in the
    reference), first ``n_train`` rows train, every column z-scored by train
    statistics. Returns a :class:`gpt_tpu.data.loaders.RegressionSplit`, or
    None when ``cadata.txt`` is absent (gitignored in the reference too,
    ``.gitignore:1``).
    """
    import os

    from gpt_tpu.data.loaders import standardize_split

    if not os.path.exists(path):
        return None
    data = np.loadtxt(path)
    y = np.log(data[:, 0])
    X = data[:, -2:]  # latitude, longitude (tensor2d.r: data$lat, data$long)
    perm_path = os.path.join(os.path.dirname(path), "permutation.mat")
    if os.path.exists(perm_path):
        import scipy.io

        perm = scipy.io.loadmat(perm_path)["ii"].ravel().astype(np.int64) - 1
        X, y = X[perm], y[perm]
    return standardize_split(X[:n_train], y[:n_train], X[n_train:], y[n_train:])
