"""Prior-draw demo utilities (GPT_demo capability).

Capability parity with ``createmesh``/``fhatdraw`` (``GPT_SGLD.jl:288-342``)
and the interactive ``GPT_demo.ipynb``: draw surfaces from the tensor-model
prior on a 2-D grid, alongside exact-GP prior draws at matched
hyperparameters, for visual/moment comparison (the ``Diagnostic_f_fhat.jl``
sanity check, test-ified in ``tests/test_demo.py``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.models import TensorGP, TensorGPParams, sample_core_indices


def create_mesh_grid(start: float, end: float, npts: int):
    """Axis vectors + flattened (npts², 2) grid (``createmesh``,
    ``GPT_SGLD.jl:288-301``; x varies slowest, matching the reference)."""
    x = jnp.linspace(start, end, npts)
    y = jnp.linspace(start, end, npts)
    gx, gy = jnp.meshgrid(x, y, indexing="ij")
    return x, y, jnp.stack([gx.ravel(), gy.ravel()], axis=1)


class PriorDraw(NamedTuple):
    f: jnp.ndarray
    params: TensorGPParams
    I: jnp.ndarray
    phi: jnp.ndarray
    model: TensorGP


def prior_draw(
    key: jax.Array,
    X: jnp.ndarray,
    *,
    n: int,
    r: int,
    Q: int,
    length_scale=1.0,
    sigma_RBF: float = 1.0,
    I: jnp.ndarray | None = None,
) -> PriorDraw:
    """One draw of f from the tensor-model prior at inputs X
    (``fhatdraw``, ``GPT_SGLD.jl:303-342``): w ~ N(0,1), U uniform-Stiefel,
    I uniform without replacement, φ scaled by √(n/Q^{1/D}).

    Core-location sampling is host-side; pass a precomputed ``I`` when
    calling under ``vmap``/``jit`` (w, U, φ draws stay traced).
    """
    D = X.shape[1]
    kI, kf, kp = jax.random.split(key, 3)
    if I is None:
        I = sample_core_indices(kI, r, D, Q)
    model = TensorGP(n=n, r=r, D=D, I=I, signal_var=1.0, sigma_w=1.0)
    rff = sample_tensor_rff(kf, n, D, dtype=X.dtype)
    phi = tensor_features(X, rff, length_scale, sigma_RBF, tensor_phi_scale(n, Q, D))
    params = model.init_params(kp, dtype=X.dtype)
    return PriorDraw(f=model.predict(params, phi), params=params, I=I, phi=phi, model=model)
