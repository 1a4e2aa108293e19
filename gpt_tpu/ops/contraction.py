"""The hot tensor-GP contraction chain (L2 compute core).

This is the TPU-native replacement for the reference's hand-written kernel
chain ``phidotU → computeV → computefhat`` (``GPT_SGLD.jl:192-230``) and its
single compiled-native component, the C kernel ``M_func`` (``inf.R:47``):

    temp[i, k, l] = ⟨φ^(k)(x_i), U^(k)_{·l}⟩          (phidot)
    V[i, q]       = Π_k temp[i, k, I[q, k]]           (core_products)
    fhat[i]       = ⟨V[i, :], w⟩                       (tensor_predict)

Design notes (TPU-first):

- ``phidot`` is one batched matmul ``(N·D, n) × (n, r)`` per dimension — a
  single ``einsum`` that XLA maps onto the MXU.
- ``core_products`` has two interchangeable implementations:
  * ``gather``  — ``take_along_axis`` over the tiny r axis then a product
    reduction over D (default; cheap for r ≤ ~50);
  * ``onehot``  — contraction with a precomputed one-hot ``(Q, D, r)`` mask,
    turning the gather into an MXU matmul (useful when Q and r are large).
- The whole chain is differentiable; ``jax.grad`` through it reproduces the
  reference's hand-derived ``computeU_phi/computeA/computePsi`` backward chain
  (``GPT_SGLD.jl:245-286``) — verified by finite differences in
  ``tests/test_models.py``.

All functions broadcast over arbitrary leading batch axes of ``U``/``w`` (for
vmapped chains).
"""
from __future__ import annotations

import jax.numpy as jnp


def phidot(phi: jnp.ndarray, U: jnp.ndarray, *, precision=None) -> jnp.ndarray:
    """``temp[..., i, k, l] = ⟨φ[i, k, :], U[..., k, :, l]⟩``.

    phi: ``(N, D, n)``; U: ``(..., D, n, r)`` → ``(..., N, D, r)``.
    Reference: ``phidotU`` (``GPT_SGLD.jl:192-205``).
    """
    return jnp.einsum("idn,...dnr->...idr", phi, U, precision=precision)


def core_indicator(I: jnp.ndarray, r: int, dtype=jnp.float32) -> jnp.ndarray:
    """One-hot ``(Q, D, r)`` indicator of the core lattice locations."""
    Q, D = I.shape
    return (I[:, :, None] == jnp.arange(r)[None, None, :]).astype(dtype)


def core_products(temp: jnp.ndarray, I: jnp.ndarray, *, mode: str = "gather",
                  precision=None) -> jnp.ndarray:
    """``V[..., i, q] = Π_k temp[..., i, k, I[q, k]]``.

    temp: ``(..., N, D, r)``; I: ``(Q, D)`` int → ``(..., N, Q)``.
    Reference: ``computeV`` (``GPT_SGLD.jl:207-220``) / the C ``M_func``
    (behaviour specified by the commented R at ``inf.R:37-46``).
    """
    if mode == "gather":
        It = I.T.astype(jnp.int32)  # (D, Q)
        idx = jnp.broadcast_to(It, temp.shape[:-1] + (It.shape[-1],))  # (..., N, D, Q)
        g = jnp.take_along_axis(temp, idx, axis=-1)  # (..., N, D, Q)
        return jnp.prod(g, axis=-2)
    elif mode == "onehot":
        onehot = core_indicator(I, temp.shape[-1], dtype=temp.dtype)
        # g[..., i, d, q] = Σ_r temp[..., i, d, r] · onehot[q, d, r]  (MXU matmul per d)
        g = jnp.einsum("...idr,qdr->...idq", temp, onehot, precision=precision)
        return jnp.prod(g, axis=-2)
    raise ValueError(f"unknown mode {mode!r}")


def leave_one_out_products(g: jnp.ndarray, axis: int) -> jnp.ndarray:
    """``out[..., d, ...] = Π_{d' ≠ d} g[..., d', ...]`` along ``axis``.

    Prefix/suffix cumulative products — no division, so exact zeros in ``g``
    give the true leave-one-out value instead of a 0/inf artifact (the same
    construction as the Pallas backward kernel). Used by the Gibbs and VI
    conditionals, which the reference computes by dividing the full product
    (``inf.R:37-46`` divides; its C kernel recomputes).
    """
    g = jnp.moveaxis(g, axis, 0)
    ones = jnp.ones_like(g[:1])
    prefix = jnp.concatenate([ones, jnp.cumprod(g, axis=0)[:-1]], axis=0)
    rev = jnp.flip(g, axis=0)
    suffix = jnp.flip(
        jnp.concatenate([ones, jnp.cumprod(rev, axis=0)[:-1]], axis=0), axis=0
    )
    return jnp.moveaxis(prefix * suffix, 0, axis)


def dense_core_predict(w: jnp.ndarray, U: jnp.ndarray, I: jnp.ndarray,
                       phi: jnp.ndarray, *, precision=None) -> jnp.ndarray:
    """Full chain with the one-hot folded into U first:
    ``Û_d = U_d E_dᵀ`` (n×Q), ``g_d = φ_d Û_d``, ``V = Π_d g_d``, ``fhat = V w``.

    More FLOPs than ``phidot``+``onehot`` (the inner dimension becomes n
    instead of r for the second matmul) but every GEMM has an MXU-friendly
    contraction dim (n ≈ 100-150, not r ≈ 10-20) — faster in practice on TPU
    for the bench shapes. Identical math; gradients via ``jax.grad``.
    """
    onehot = core_indicator(I, U.shape[-1], dtype=U.dtype)  # (Q, D, r)
    Uhat = jnp.einsum("...dnr,qdr->...dnq", U, onehot, precision=precision)
    g = jnp.einsum("idn,...dnq->...idq", phi, Uhat, precision=precision)
    V = jnp.prod(g, axis=-2)
    return jnp.einsum("...iq,...q->...i", V, w, precision=precision)


def fleet_tensor_predict(w: jnp.ndarray, U: jnp.ndarray, I: jnp.ndarray,
                         phi: jnp.ndarray, *, mode: str = "gather",
                         precision=None) -> jnp.ndarray:
    """Chain-MERGED prediction: the whole fleet's factor columns ride the MXU
    lane axis of ONE matmul per dimension.

    ``w (C, Q)``, ``U (C, D, n, r)``, ``phi (N, D, n)`` → ``fhat (C, N)``.

    The batched-per-chain form (``tensor_predict`` under vmap) lowers to C·D
    independent ``(N, n) @ (n, r)`` matmuls whose r ≈ 10–20 output columns
    fill ≤ r/128 of the MXU lane axis. Because φ is SHARED across chains, the
    per-dimension products concatenate for free: reshaping ``U`` to
    ``(D, n, C·r)`` turns them into one ``(N, n) @ (n, C·r)`` matmul per
    dimension — full lanes, identical FLOPs, identical math. This is the
    full-batch GMC gradient's hot shape (``GPT_SGLD.jl:684-805``; e.g. PP
    parity: (5000, 150) @ (150, 16·20)), where lane merging is the difference
    between ~2.5% and >10% of f32 peak (SPEEDLIGHT.md).

    ``mode`` picks the core-index expansion: ``"gather"`` indexes the tiny r
    axis per dimension (cheap forward; backward is a scatter-add);
    ``"onehot"`` contracts with the per-dimension ``(Q, r)`` indicator so both
    directions are matmuls. Gradients via ``jax.grad`` — the transposed
    matmuls are lane-merged too.
    """
    C, D, n, r = U.shape
    N = phi.shape[0]
    Um = jnp.transpose(U, (1, 2, 0, 3)).reshape(D, n, C * r)
    V = None
    for d in range(D):
        td = jnp.einsum("in,nm->im", phi[:, d, :], Um[d],
                        precision=precision).reshape(N, C, r)
        if mode == "gather":
            gd = td[:, :, I[:, d]]                                  # (N, C, Q)
        elif mode == "onehot":
            oh = (I[:, d][:, None] == jnp.arange(r)).astype(td.dtype)  # (Q, r)
            gd = jnp.einsum("icr,qr->icq", td, oh, precision=precision)
        else:
            raise ValueError(f"unknown mode {mode!r}")
        V = gd if V is None else V * gd
    return jnp.einsum("icq,cq->ci", V, w, precision=precision)


def tensor_predict(w: jnp.ndarray, U: jnp.ndarray, I: jnp.ndarray,
                   phi: jnp.ndarray, *, mode: str = "gather",
                   precision=None) -> jnp.ndarray:
    """Full chain ``fhat[..., i] = Σ_q w[..., q] · V[..., i, q]``.

    Reference: ``pred`` (``GPT_SGLD.jl:232-243``). ``precision`` pins the MXU
    matmul precision — pass ``"highest"`` for MH-exact samplers (GMC/HMC),
    where default bf16 inputs corrupt the Hamiltonian by thousands of nats on
    full-batch likelihoods.
    """
    temp = phidot(phi, U, precision=precision)
    V = core_products(temp, I, mode=mode, precision=precision)
    return jnp.einsum("...iq,...q->...i", V, w, precision=precision)
