"""Tucker tensor-GP regression model (L2).

The model of the reference's ``GPTregression`` family (``GPT_SGLD.jl:344-448``):

    f(x) = Σ_q w_q · Π_k ⟨φ^(k)(x_k), U^(k)_{·, I[q,k]}⟩

with per-dimension RFF features φ^(k), orthonormal factors U^(k) on the
Stiefel manifold V_{n,r} (or Gaussian-prior Euclidean factors), and a sparse
Tucker core w with Q nonzeros at lattice locations ``I ∈ [r]^{Q×D}``.

TPU-first design: the model is a pair of pure functions (``log_lik``,
``log_prior``) plus ``predict`` — gradients come from ``jax.grad`` (the
reference hand-derives them at ``GPT_SGLD.jl:392-408`` via
computeU_phi/computeA/computePsi; finite-difference tests check our autodiff
against that math). Parameters carry arbitrary leading batch axes so chains
vmap for free.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpt_tpu.ops.contraction import tensor_predict
from gpt_tpu.utils import stiefel


class TensorGPParams(NamedTuple):
    w: jnp.ndarray  # (..., Q) sparse core values
    U: jnp.ndarray  # (..., D, n, r) factor matrices


def sample_core_indices(key: jax.Array, r: int, D: int, Q: int) -> jnp.ndarray:
    """Sample Q distinct lattice locations uniformly from [r]^D → (Q, D) int32.

    Reference: ``samplenz`` (``GPT_SGLD.jl:179-190``) samples linear indices
    from [0, r^D) without replacement and expands base-r digits. For large
    r^D (kin40k: 20^8 = 2.56e10) linear indices overflow int32, so we sample
    digit-tuples directly and deduplicate via a keyed loop in numpy space —
    this is host-side setup code (runs once, not in the training step).
    """
    import numpy as np

    rng = np.random.default_rng(np.asarray(jax.random.key_data(key)).ravel()[-1])
    if r ** D <= 10_000_000:
        lin = rng.choice(r ** D, size=Q, replace=False)
        digits = np.zeros((Q, D), dtype=np.int32)
        rem = lin
        for d in range(D):
            digits[:, d] = rem % r
            rem = rem // r
        return jnp.asarray(digits)
    seen: set[tuple[int, ...]] = set()
    out = np.zeros((Q, D), dtype=np.int32)
    count = 0
    while count < Q:
        cand = rng.integers(0, r, size=(Q, D))
        for row in cand:
            tup = tuple(int(v) for v in row)
            if tup not in seen:
                seen.add(tup)
                out[count] = row
                count += 1
                if count == Q:
                    break
    return jnp.asarray(out)


@dataclass(frozen=True)
class TensorGP:
    """Tensor-GP regression model definition.

    Attributes mirror the reference's ``GPTregression`` arguments
    (``GPT_SGLD.jl:345``): ``I`` core locations, ``signal_var`` observation
    noise, ``sigma_w`` core prior scale (1 in ``GPT_SGLD.jl:354``;
    ``sqrt(n^D/Q)`` in ``GPT_SGLD_p.jl:155`` — configurable), and ``stiefel``
    selecting orthonormal vs Gaussian factors.
    """

    n: int
    r: int
    D: int
    I: jnp.ndarray  # (Q, D) int32, static per model
    signal_var: float
    sigma_w: float = 1.0
    stiefel: bool = True
    # "onehot" turns the core gather into an MXU matmul whose transpose is
    # also a matmul — 36x faster than the gather/scatter pair on TPU
    # (measured v5e: grad 49ms gather vs 1.4ms onehot at C=64 chains).
    contraction: str = "onehot"
    # matmul precision for predict/log_lik; set "highest" for MH-exact
    # samplers (GMC) where bf16 MXU rounding corrupts the accept ratio.
    precision: str | None = None
    # Pallas-backend gradient contract: with contraction="pallas" and
    # diff_phi=False, predict() routes through the fused kernel whose custom
    # VJP returns a ZERO cotangent for phi — correct (and fast) for the
    # samplers, which only differentiate parameters, but silently wrong for
    # any caller differentiating through phi (feature/length-scale learning).
    # Default True keeps the full φ̄ backward; samplers construct their model
    # with diff_phi=False explicitly.
    diff_phi: bool = True

    @property
    def Q(self) -> int:
        return self.I.shape[0]

    # -- parameters ---------------------------------------------------------
    def init_params(self, key: jax.Array, dtype=jnp.float32) -> TensorGPParams:
        """w ~ N(0, σ_w²); U uniform on V_{n,r} (or N(0, 1/n) per element).

        Reference: ``GPT_SGLD.jl:356-369``.
        """
        kw, ku = jax.random.split(key)
        w = self.sigma_w * jax.random.normal(kw, (self.Q,), dtype=dtype)
        if self.stiefel:
            U = stiefel.sample_stiefel(ku, self.n, self.r, batch=(self.D,), dtype=dtype)
        else:
            U = jax.random.normal(ku, (self.D, self.n, self.r), dtype=dtype) / jnp.sqrt(
                jnp.asarray(self.n, dtype)
            )
        return TensorGPParams(w=w, U=U)

    @property
    def manifolds(self) -> TensorGPParams:
        """Pytree of manifold tags matching ``init_params`` output."""
        return TensorGPParams(
            w="euclidean", U="stiefel" if self.stiefel else "euclidean"
        )

    @property
    def event_ndims(self) -> TensorGPParams:
        """Trailing parameter axes per leaf (leading axes = chains)."""
        return TensorGPParams(w=1, U=3)

    # -- densities ----------------------------------------------------------
    def predict(self, params: TensorGPParams, phi: jnp.ndarray) -> jnp.ndarray:
        """fhat over a feature batch ``phi (N, D, n)`` → ``(..., N)``."""
        if self.contraction == "pallas":
            import jax as _jax

            from gpt_tpu.ops.pallas_contraction import fused_tensor_predict

            lead = params.w.shape[:-1]
            C = 1
            for s in lead:
                C *= s
            w = params.w.reshape(C, self.Q)
            U = params.U.reshape(C, self.D, self.n, self.r)
            # diff_phi=False skips the (C, m, D, n) φ̄ backward tensor — see
            # the field docstring for the zero-phi-gradient contract.
            out = fused_tensor_predict(
                w, U, self.I, phi,
                interpret=_jax.default_backend() != "tpu",
                diff_phi=self.diff_phi,
            )
            return out.reshape(*lead, phi.shape[0])
        if self.contraction in ("merged", "merged_onehot"):
            # Chain-MERGED lanes: all chains' factor columns concatenate into
            # the lane axis of one (N, n) @ (n, C·r) matmul per dimension —
            # same FLOPs as the batched form, full MXU lanes (the full-batch
            # GMC gradient's speed-of-light layout; see
            # ops.contraction.fleet_tensor_predict).
            from gpt_tpu.ops.contraction import fleet_tensor_predict

            lead = params.w.shape[:-1]
            C = 1
            for s in lead:
                C *= s
            out = fleet_tensor_predict(
                params.w.reshape(C, self.Q),
                params.U.reshape(C, self.D, self.n, self.r),
                self.I, phi,
                mode="onehot" if self.contraction == "merged_onehot" else "gather",
                precision=self.precision,
            )
            return out.reshape(*lead, phi.shape[0])
        if self.contraction == "dense":
            from gpt_tpu.ops.contraction import dense_core_predict

            return dense_core_predict(params.w, params.U, self.I, phi,
                                      precision=self.precision)
        return tensor_predict(params.w, params.U, self.I, phi,
                              mode=self.contraction, precision=self.precision)

    def log_lik(self, params: TensorGPParams, phi: jnp.ndarray, y: jnp.ndarray,
                weight: jnp.ndarray | None = None) -> jnp.ndarray:
        """Σ_i weight_i · log N(y_i | fhat_i, signal_var), without the constant.

        ``weight`` masks padded batch entries (the reference's ragged last
        minibatch, ``GPT_SGLD.jl:379``, handled here by padding + mask).
        """
        fhat = self.predict(params, phi)
        sq = (y - fhat) ** 2
        if weight is not None:
            sq = sq * weight
        return -jnp.sum(sq, axis=-1) / (2.0 * self.signal_var)

    def log_prior(self, params: TensorGPParams) -> jnp.ndarray:
        """log p(w) (+ log p(U) in the Euclidean case).

        Stiefel factors have the uniform (Haar) prior — no density term.
        Euclidean factors have N(0, 1/n) per element, matching the
        reference's ``−n·U`` prior gradient (``GPT_SGLD.jl:426``).
        """
        lp = -jnp.sum(params.w**2, axis=-1) / (2.0 * self.sigma_w**2)
        if not self.stiefel:
            lp = lp - self.n * jnp.sum(params.U**2, axis=(-3, -2, -1)) / 2.0
        return lp
