"""Hyperparameter sweep harnesses (L5/L7).

Capability parity with the reference's sweep scripts:

- ``RMSEvsEps.jl`` — test RMSE as a function of SGLD step size;
- ``lkhdLearningCurve.jl`` — learning curves across feature counts;
- the ``Iterators.product`` + ``@parallel`` grid sweeps embedded in the
  experiment drivers (``100k_movielensExperiment.jl:619-638``).

Sweep points are independent chains, so they run as one vmapped program —
the grid IS the chain axis (shard it with ``gpt_tpu.parallel`` for large
grids).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gpt_tpu.inference import SGLDConfig, run_sgld


class EpsSweepResult(NamedTuple):
    eps_values: np.ndarray
    final_rmse: np.ndarray  # (len(eps),) de-normalised final-epoch test RMSE
    min_rmse: np.ndarray
    curves: np.ndarray  # (len(eps), maxepoch)


def eps_sensitivity(
    model,
    params0,
    key: jax.Array,
    phi_train,
    y_train: jnp.ndarray,
    phi_test,
    y_test: jnp.ndarray,
    *,
    make_eps,  # float -> pytree-prefix of step sizes for SGLDConfig
    eps_values: Sequence[float],
    m: int,
    burnin: int,
    maxepoch: int,
    y_std: float = 1.0,
    transport: str = "geodesic",
) -> EpsSweepResult:
    """RMSE-vs-step-size sweep (``RMSEvsEps.jl``): same init/key per point.

    Step sizes are baked per compiled program (they change the update law),
    so points loop in Python; each point's run is fully jitted.
    """
    curves = []
    for e in eps_values:
        cfg = SGLDConfig(eps=make_eps(e), transport=transport)
        _, fhat = run_sgld(
            model, params0, key, phi_train, y_train,
            m=m, config=cfg, burnin=burnin, maxepoch=maxepoch,
            collect_fn=lambda p: model.predict(p, phi_test),
        )
        err = fhat - y_test[None, :]
        curves.append(np.asarray(y_std * jnp.sqrt(jnp.mean(err**2, axis=-1))))
    curves = np.stack(curves)
    return EpsSweepResult(
        eps_values=np.asarray(list(eps_values)),
        final_rmse=curves[:, -1],
        min_rmse=curves.min(axis=1),
        curves=curves,
    )
