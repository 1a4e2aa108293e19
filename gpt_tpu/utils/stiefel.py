"""Stiefel-manifold geometry (L0).

Capability parity with the reference's manifold layer (``GPT_SGLD.jl:14-59``):
tangent projection, geodesic endpoint, geodesic with transported momentum, and
uniform sampling from V_{n,r}. Everything here is pure JAX, jit/vmap-safe, and
batched over arbitrary leading axes, so a (D, n, r) stack of factor matrices —
or a (chains, D, n, r) stack — moves in one fused XLA program.

TPU-first deviations from the reference:

- The reference aborts a whole run with all-zero parameter stores when the
  2r×2r matrix exponential produces NaN (``GPT_SGLD.jl:23-26``). Here the
  geodesic simply returns its (possibly NaN) endpoint and samplers use
  :func:`guard` to *reject the step* (keep the previous point) and count the
  event — data-dependent aborts do not exist under ``jit``.
- A Cayley retraction (Wen & Yin 2013, low-rank Sherman–Morrison–Woodbury
  form) is provided as the MXU-friendly default transport: matmuls plus one
  2r×2r solve, no matrix exponential. The exact geodesic remains available for
  parity runs and for geodesic Monte Carlo, which needs momentum transport.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.linalg import expm as _expm

# Manifold algebra defaults to HIGHEST matmul precision: the matrices are
# tiny (n×r, r ≤ ~50), while default bf16 MXU inputs accumulate enough error
# over 10⁴-10⁵ transports to walk U off the manifold. With the per-step
# Newton–Schulz correction (always HIGHEST) manifold adherence no longer
# depends on transport precision, so SGLD-style samplers may trade transport
# accuracy for speed via GPT_TPU_STIEFEL_PRECISION=default; MH-exact samplers
# (GMC) should keep highest.
import os as _os

_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": None,
}[_os.environ.get("GPT_TPU_STIEFEL_PRECISION", "highest")]
_einsum = functools.partial(jnp.einsum, precision=_PRECISION)
_einsum_hi = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def project_tangent(U: jnp.ndarray, V: jnp.ndarray) -> jnp.ndarray:
    """Project ``V`` onto the tangent space of the Stiefel manifold at ``U``.

    ``proj(U, V) = V - U (UᵀV + VᵀU) / 2`` (reference: ``GPT_SGLD.jl:14-16``).
    Batched over leading axes of both arguments.
    """
    UtV = _einsum("...ji,...jk->...ik", U, V)
    sym = (UtV + jnp.swapaxes(UtV, -1, -2)) / 2
    return V - _einsum("...ij,...jk->...ik", U, sym)


def expm_taylor(X: jnp.ndarray, *, degree: int = 8, squarings: int = 4) -> jnp.ndarray:
    """Matmul-only matrix exponential: scaling-and-squaring + Taylor.

    ``expm(X) = taylor(X / 2^s)^(2^s)`` with a degree-``degree`` Taylor
    series — batched matmuls only, no LU solve. XLA's batched small-matrix LU
    (inside the Padé ``jax.scipy.linalg.expm``) is scalar-bound on TPU:
    measured 2.3 ms per GMC leapfrog for 128 batched 40×40 expms, as much as
    the entire fleet gradient. For ``‖X‖ ≤ 2^s / 4`` the truncation error is
    ≤ 0.25^(d+1)/(d+1)! ≈ 1e-11 — below f32 roundoff, so geodesics through
    this path match the Padé ones to float precision (asserted in
    ``tests/test_stiefel.py``). GMC leapfrog times ``t = √ε·η`` put ``‖tA‖``
    at ~1e-2, far inside that region.
    """
    scale = 2.0 ** (-squarings)
    Xs = X * scale
    eye = jnp.broadcast_to(jnp.eye(X.shape[-1], dtype=X.dtype), X.shape)
    E = eye + Xs
    term = Xs
    for k in range(2, degree + 1):
        term = _einsum_hi("...ij,...jk->...ik", term, Xs) / k
        E = E + term
    for _ in range(squarings):
        E = _einsum_hi("...ij,...jk->...ik", E, E)
    return E


def _geodesic_blocks(U: jnp.ndarray, mom: jnp.ndarray, t,
                     method: str = "pade") -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shared core: returns ([U mom] @ E, expm(-tA)) for the 2r×2r system.

    The geodesic on V_{n,r} through ``U`` with tangent ``mom`` evaluates as
    ``[U mom] · expm(t·[[A, -momᵀmom], [I, A]])[:, :r] · expm(-tA)`` with
    ``A = Uᵀ mom`` (reference: ``GPT_SGLD.jl:19-37``; Edelman et al. 1998).
    r is tiny (≤ ~50) so the expm is a small dense op, vmapped over the
    leading batch axes. ``method="taylor"`` routes both exponentials through
    :func:`expm_taylor` (matmul-only; float-exact for leapfrog-scale ``t``
    and ~8× faster batched on TPU than the Padé path's scalar-bound LU).
    """
    r = U.shape[-1]
    A = _einsum("...ji,...jk->...ik", U, mom)  # UᵀM, (..., r, r)
    MtM = _einsum("...ji,...jk->...ik", mom, mom)  # MᵀM
    eye = jnp.broadcast_to(jnp.eye(r, dtype=U.dtype), A.shape)
    top = jnp.concatenate([A, -MtM], axis=-1)
    bot = jnp.concatenate([eye, A], axis=-1)
    block = jnp.concatenate([top, bot], axis=-2)  # (..., 2r, 2r)

    t = jnp.asarray(t, dtype=U.dtype)
    if method == "taylor":
        expm_fn = expm_taylor
    else:
        expm_fn = _expm
        for _ in range(block.ndim - 2):
            expm_fn = jax.vmap(expm_fn)
    E = expm_fn(t[..., None, None] * block if t.ndim else t * block)
    mexp = expm_fn(-t[..., None, None] * A if t.ndim else -t * A)

    UM = jnp.concatenate([U, mom], axis=-1)  # (..., n, 2r)
    return _einsum("...nj,...jk->...nk", UM, E), mexp


def _normalize_columns(U: jnp.ndarray) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(U * U, axis=-2, keepdims=True))
    return U / norm


def geodesic(U: jnp.ndarray, mom: jnp.ndarray, t, method: str = "pade") -> jnp.ndarray:
    """Geodesic endpoint on V_{n,r}; columns re-normalised to unit norm.

    Matches the endpoint semantics of the reference's ``geod``
    (``GPT_SGLD.jl:19-37``) minus the NaN→zeros abort: NaNs propagate and are
    handled by :func:`guard` at the call site.
    """
    r = U.shape[-1]
    UME, mexp = _geodesic_blocks(U, mom, t, method)
    new_U = _einsum("...nj,...jk->...nk", UME[..., :r], mexp)
    return _normalize_columns(new_U)


def geodesic_with_momentum(U: jnp.ndarray, mom: jnp.ndarray, t,
                           method: str = "pade") -> tuple[jnp.ndarray, jnp.ndarray]:
    """Geodesic endpoint and parallel-transported momentum.

    Matches ``geodboth`` (``GPT_SGLD.jl:40-59``): the endpoint's columns are
    re-normalised, the momentum is not.
    """
    r = U.shape[-1]
    UME, mexp = _geodesic_blocks(U, mom, t, method)
    new_U = _einsum("...nj,...jk->...nk", UME[..., :r], mexp)
    new_mom = _einsum("...nj,...jk->...nk", UME[..., r:], mexp)
    return _normalize_columns(new_U), new_mom


def project_tangent_fleet(U: jnp.ndarray, V: jnp.ndarray) -> jnp.ndarray:
    """Tangent projection for CHAIN-STACKED frames, chain axis merged into
    the MXU lane axis.

    ``U, V: (C, *batch, n, r)`` → same result as :func:`project_tangent`
    per chain, but each batched slice computes ONE pair of
    ``(n, C·r)``-shaped matmuls with the cross-chain blocks of ``UᵀV``
    masked to zero, instead of C tiny ``(n, r)`` matmuls — XLA's batched
    small-matmul path is dispatch-bound (measured 0.5 ms per GMC half-step
    at C=16, D=8, r=20 regardless of precision; the merged form is one MXU
    pass per batch slice).
    """
    C, r = U.shape[0], U.shape[-1]
    Cr = C * r
    Um = jnp.moveaxis(U, 0, -2).reshape(U.shape[1:-2] + (U.shape[-2], Cr))
    Vm = jnp.moveaxis(V, 0, -2).reshape(Um.shape)
    S = _einsum("...nm,...np->...mp", Um, Vm)            # (..., Cr, Cr)
    i = jax.lax.broadcasted_iota(jnp.int32, (Cr, Cr), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (Cr, Cr), 1)
    blockmask = (i // r) == (j // r)
    sym = jnp.where(blockmask, (S + jnp.swapaxes(S, -1, -2)) / 2, 0.0)
    out = Vm - _einsum("...nm,...mp->...np", Um, sym)
    out = out.reshape(U.shape[1:-2] + (U.shape[-2], C, r))
    return jnp.moveaxis(out, -2, 0)


def cayley_retract(U: jnp.ndarray, G: jnp.ndarray, t) -> jnp.ndarray:
    """Cayley retraction along ascent direction ``G`` — the TPU-fast transport.

    Wen & Yin (2013) low-rank form: with ``A = G − ½·U·(UᵀG)`` and the skew
    matrix ``W = A Uᵀ − U Aᵀ``, the Cayley curve
    ``Y(t) = (I − t/2·W)⁻¹ (I + t/2·W) U`` stays on the manifold (Y = QU with
    orthogonal Q) and has initial velocity ``Ẏ(0) = W U = proj_U(G)`` — the
    tangent projection of ``G``, exactly matching the geodesic's start. With
    ``W = J Kᵀ``, ``J = [A, U]``, ``K = [U, −A]`` and the push-through
    identity, only a 2r×2r solve is needed:
    ``Y(t) = U + t·J (I − t/2·KᵀJ)⁻¹ Kᵀ U``.

    This is a first-order-equivalent alternative to :func:`geodesic`
    (matmul + small solve only; no expm), offered as the default for SGLD
    where exact geodesics are unnecessary.
    """
    t = jnp.asarray(t, dtype=U.dtype)
    A = G - 0.5 * _einsum(
        "...ni,...ij->...nj", U, _einsum("...ni,...nj->...ij", U, G)
    )
    J = jnp.concatenate([A, U], axis=-1)  # (..., n, 2r)
    K = jnp.concatenate([U, -A], axis=-1)  # (..., n, 2r)
    KtJ = _einsum("...ni,...nj->...ij", K, J)  # (..., 2r, 2r)
    r2 = KtJ.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(r2, dtype=U.dtype), KtJ.shape)
    tb = t[..., None, None] if t.ndim else t
    M = eye - (tb / 2) * KtJ
    KtU = _einsum("...ni,...nk->...ik", K, U)  # (..., 2r, r)
    sol = jnp.linalg.solve(M, KtU)
    return U + tb * _einsum("...nj,...jk->...nk", J, sol)


def polar_retract(U: jnp.ndarray, mom: jnp.ndarray, t, *, iters: int = 3) -> jnp.ndarray:
    """Polar retraction: ``Y(t) = polar(U + t·mom)`` — the speed-of-light
    transport for SGLD steps.

    For tangent ``mom`` (Uᵀmom skew), ``(U+tM)ᵀ(U+tM) = I + t²MᵀM``, so the
    polar factor is reachable by :func:`orthonormalize`'s Newton–Schulz
    iteration in ``iters`` matmul-only steps — no solve, no expm. Initial
    velocity is ``mom`` (first-order equivalent to the geodesic and Cayley
    transports). Profiling note: the Cayley 2r×2r ``linalg.solve`` costs
    ~6 ms/step batched (C=256, D=4, r=10) on TPU v5e because XLA's batched
    small LU is scalar-bound; this transport replaces it with ~0.1 ms of
    MXU matmuls.
    """
    t = jnp.asarray(t, dtype=U.dtype)
    tb = t[..., None, None] if t.ndim else t
    return orthonormalize(U + tb * mom, iters=iters)


def sample_stiefel(key: jax.Array, n: int, r: int, *, batch: tuple[int, ...] = (),
                   dtype=jnp.float32) -> jnp.ndarray:
    """Sample uniformly (Haar) from the Stiefel manifold V_{n,r}.

    The reference uses ``U = Z (ZᵀZ)^{-1/2}`` via a dense ``sqrtm``
    (``GPT_SGLD.jl:365-367``). Here the distributionally identical QR
    construction is used — ``Z = QR`` with the R-diagonal sign fix gives Haar
    measure on V_{n,r} — because QR is backward stable: in float32 on TPU the
    eigh-based inverse-sqrt leaves ‖UᵀU − I‖ ≈ 8e-3 (measured), which seeds
    NaN drift over thousands of manifold transports, while QR gives ~1e-6.
    """
    if r > n:
        raise ValueError(
            f"V_(n={n}, r={r}) is empty: orthonormal n x r frames need r <= n. "
            "Use Euclidean (Gaussian-prior) factors for r > n — the reference's "
            "r>n configs (ImageExperiment.jl n=5, r=10) only make sense there; "
            "its own Stiefel init is singular for r > n."
        )
    Z = jax.random.normal(key, (*batch, n, r), dtype=dtype)
    Q, R = jnp.linalg.qr(Z)
    sign = jnp.sign(jnp.diagonal(R, axis1=-2, axis2=-1))
    sign = jnp.where(sign == 0, 1.0, sign)
    return Q * sign[..., None, :]


def orthonormalize(U: jnp.ndarray, iters: int = 2) -> jnp.ndarray:
    """Newton–Schulz polar correction: project a near-orthonormal frame back
    onto V_{n,r} with matmuls only.

    ``X ← X(3I − XᵀX)/2`` converges quadratically to the polar factor for
    ‖XᵀX − I‖ < 1 — two iterations take the residual float-roundoff drift of a
    transport (~1e-3 on bf16-era TPUs) to ~1e-7. Used by the samplers after
    every Stiefel transport; MXU-friendly unlike a per-step QR.
    """
    eye = jnp.eye(U.shape[-1], dtype=U.dtype)
    X = U
    for _ in range(iters):
        XtX = _einsum_hi("...ni,...nj->...ij", X, X)
        X = 0.5 * _einsum_hi("...ni,...ij->...nj", X, 3.0 * eye - XtX)
    return X


def guard(new: jnp.ndarray, old: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reject non-finite transport results: keep ``old`` where ``new`` has NaN/Inf.

    Replaces the reference's abort-with-zeros contract (``GPT_SGLD.jl:23-26``,
    ``GPT_SGLD.jl:422-424``) with a per-matrix rejection + indicator that
    samplers accumulate into a diagnostics counter.
    """
    finite = jnp.all(jnp.isfinite(new), axis=(-2, -1), keepdims=True)
    return jnp.where(finite, new, old), ~finite.squeeze((-2, -1))


def check_orthonormal(U: jnp.ndarray, atol: float = 1e-4) -> jnp.ndarray:
    """Max deviation of UᵀU from the identity (diagnostic)."""
    r = U.shape[-1]
    UtU = _einsum("...ni,...nj->...ij", U, U)
    return jnp.max(jnp.abs(UtU - jnp.eye(r, dtype=U.dtype)))
