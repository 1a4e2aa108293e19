"""Softmax classification heads (L2).

Capability parity with the reference's classification models:

- ``FullThetaClassifier`` — ``GPNT_SGLDclass`` (``GPT_SGLD.jl:849-901``):
  per-class weights θ_c in RFF space, softmax likelihood.
- ``TensorGPClassifier`` — ``GPTclassification`` (``GPT_SGLD.jl:450-680``):
  per-class core w^(c) and factors U^(c,k). The reference's double
  w/U-update-per-batch bug (``GPT_SGLD.jl:624-671``) is intentionally NOT
  reproduced — one update per batch (SURVEY.md §7.3).

Class axes are plain leading array axes so the per-class computation is one
batched contraction, not a Python loop (the "EP analog" of SURVEY.md §2.9).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from gpt_tpu.ops.contraction import tensor_predict
from gpt_tpu.utils import stiefel


class FullThetaClassParams(NamedTuple):
    theta: jnp.ndarray  # (..., C, n)


@dataclass(frozen=True)
class FullThetaClassifier:
    n: int
    num_classes: int
    sigma_theta: float = 1.0

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> FullThetaClassParams:
        return FullThetaClassParams(
            theta=self.sigma_theta
            * jax.random.normal(key, (self.num_classes, self.n), dtype=dtype)
        )

    @property
    def manifolds(self) -> FullThetaClassParams:
        return FullThetaClassParams(theta="euclidean")

    @property
    def event_ndims(self) -> FullThetaClassParams:
        """Trailing parameter axes per leaf (leading axes = chains)."""
        return FullThetaClassParams(theta=2)

    def logits(self, params: FullThetaClassParams, phi: jnp.ndarray) -> jnp.ndarray:
        """``f[..., i, c] = φ_i ᵀ θ_c`` for ``phi (N, n)``."""
        return jnp.einsum("in,...cn->...ic", phi, params.theta)

    def predict_proba(self, params, phi):
        return jax.nn.softmax(self.logits(params, phi), axis=-1)

    def log_lik(self, params: FullThetaClassParams, phi: jnp.ndarray, y: jnp.ndarray,
                weight: jnp.ndarray | None = None) -> jnp.ndarray:
        """Σ_i weight_i · [f_{y_i} − logsumexp_c f_c] (``GPT_SGLD.jl:868-875``)."""
        f = self.logits(params, phi)  # (..., N, C)
        fy = jnp.take_along_axis(f, y[..., :, None].astype(jnp.int32), axis=-1)[..., 0]
        ll = fy - logsumexp(f, axis=-1)
        if weight is not None:
            ll = ll * weight
        return jnp.sum(ll, axis=-1)

    def log_prior(self, params: FullThetaClassParams) -> jnp.ndarray:
        return -jnp.sum(params.theta**2, axis=(-2, -1)) / (2.0 * self.sigma_theta**2)


class TensorClassParams(NamedTuple):
    w: jnp.ndarray  # (..., C, Q)
    U: jnp.ndarray  # (..., C, D, n, r)


@dataclass(frozen=True)
class TensorGPClassifier:
    n: int
    r: int
    D: int
    num_classes: int
    I: jnp.ndarray  # (Q, D) int32
    sigma_w: float = 1.0
    stiefel: bool = True
    contraction: str = "onehot"  # see TensorGP.contraction

    @property
    def Q(self) -> int:
        return self.I.shape[0]

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> TensorClassParams:
        kw, ku = jax.random.split(key)
        C = self.num_classes
        w = self.sigma_w * jax.random.normal(kw, (C, self.Q), dtype=dtype)
        if self.stiefel:
            U = stiefel.sample_stiefel(ku, self.n, self.r, batch=(C, self.D), dtype=dtype)
        else:
            U = jax.random.normal(ku, (C, self.D, self.n, self.r), dtype=dtype) / jnp.sqrt(
                jnp.asarray(self.n, dtype)
            )
        return TensorClassParams(w=w, U=U)

    @property
    def manifolds(self) -> TensorClassParams:
        return TensorClassParams(w="euclidean", U="stiefel" if self.stiefel else "euclidean")

    @property
    def event_ndims(self) -> TensorClassParams:
        """Trailing parameter axes per leaf (leading axes = chains)."""
        return TensorClassParams(w=2, U=4)

    def logits(self, params: TensorClassParams, phi: jnp.ndarray) -> jnp.ndarray:
        """``f[..., i, c]`` — per-class tensor-GP predictions, ``phi (N, D, n)``."""
        f = tensor_predict(params.w, params.U, self.I, phi, mode=self.contraction)  # (..., C, N)
        return jnp.swapaxes(f, -1, -2)

    def predict_proba(self, params, phi):
        return jax.nn.softmax(self.logits(params, phi), axis=-1)

    def log_lik(self, params: TensorClassParams, phi: jnp.ndarray, y: jnp.ndarray,
                weight: jnp.ndarray | None = None) -> jnp.ndarray:
        f = self.logits(params, phi)
        # broadcast the label index over any leading chain axes of f
        idx = jnp.broadcast_to(
            y[..., :, None].astype(jnp.int32), f.shape[:-1] + (1,)
        )
        fy = jnp.take_along_axis(f, idx, axis=-1)[..., 0]
        ll = fy - logsumexp(f, axis=-1)
        if weight is not None:
            ll = ll * weight
        return jnp.sum(ll, axis=-1)

    def log_prior(self, params: TensorClassParams) -> jnp.ndarray:
        lp = -jnp.sum(params.w**2, axis=(-2, -1)) / (2.0 * self.sigma_w**2)
        if not self.stiefel:
            lp = lp - self.n * jnp.sum(params.U**2, axis=(-4, -3, -2, -1)) / 2.0
        return lp
