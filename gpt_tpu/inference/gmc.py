"""Geodesic Monte Carlo (GMC) — exact-MH Riemannian HMC on the Stiefel manifold (L3).

Capability parity with ``GPT_GMC`` (``GPT_SGLD.jl:684-805``): full-data
Hamiltonian dynamics with Euclidean momentum for w and tangent-space momentum
for the Stiefel factors U, leapfrog integration with half-step momentum
updates and geodesic position updates (momentum parallel-transported via
``geodesic_with_momentum``), and a Metropolis–Hastings accept/reject on the
full joint.

Update law per leapfrog step (reference: ``GPT_SGLD.jl:717-787``):

    p   += √ε_w · ∇_w logπ / 2            mom ← proj_U(mom + √ε_U · ∇_U logπ / 2)
    w   += √ε_w · p                        (U, mom) ← geodesic(U, mom, √ε_U)
    p   += √ε_w · ∇_w logπ / 2            mom ← proj_U(mom + √ε_U · ∇_U logπ / 2)

TPU-first: the L-step leapfrog is a ``lax.scan``; a full epoch (leapfrog + MH)
is another scan; gradients come from ``jax.grad`` of the model's log-joint.
A non-finite proposal is rejected by the MH test instead of aborting the run
(the reference returns all-zero stores, ``GPT_SGLD.jl:751-754``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from gpt_tpu.utils import stiefel


@dataclasses.dataclass(frozen=True)
class GMCConfig:
    """Leapfrog step sizes (pytree-prefix like SGLDConfig.eps) and step count.

    ``jitter_steps=True`` draws L ~ U[1, num_leapfrog] per epoch (a masked
    fixed-length scan — no recompilation), breaking the periodic-orbit
    resonances a fixed trajectory length can lock into; standard HMC practice
    (Neal 2011 §3.2) that the in-framework HMC engine already uses.

    ``adapt_step_size=True`` runs Stan-style dual averaging (Hoffman & Gelman
    2014, Alg. 5 — the same scheme as ``inference.hmc``) on a GLOBAL scalar
    multiplier of the leapfrog time √ε during the burn-in epochs, targeting
    ``target_accept``; the w/U step-size *ratio* stays fixed at the configured
    ``eps``. Post burn-in the averaged multiplier is frozen, preserving
    detailed balance. This is what the reference tunes by hand and logs as
    accept_prob traces (``GPT_SGLD.jl:789-797``).
    """

    eps: Any
    num_leapfrog: int
    jitter_steps: bool = False
    adapt_step_size: bool = False
    target_accept: float = 0.8
    # dual-averaging constants (Stan defaults)
    gamma: float = 0.05
    t0: float = 10.0
    kappa: float = 0.75
    # "taylor" = matmul-only scaling-and-squaring expm (float-exact at
    # leapfrog-scale t; ~8x faster batched than Pade's scalar-bound LU on
    # TPU — stiefel.expm_taylor). "pade" = jax.scipy expm (legacy streams).
    geodesic_method: str = "pade"


def _sample_momenta(key, params, manifolds):
    leaves, treedef = jax.tree.flatten(params)
    mleaves = treedef.flatten_up_to(manifolds)
    keys = jax.random.split(key, len(leaves))
    out = []
    for p, man, k in zip(leaves, mleaves, keys):
        noise = jax.random.normal(k, p.shape, p.dtype)
        out.append(stiefel.project_tangent(p, noise) if man == "stiefel" else noise)
    return jax.tree.unflatten(treedef, out)


def _kinetic(momenta):
    return sum(jnp.sum(m**2) / 2 for m in jax.tree.leaves(momenta))


def _half_step(params, momenta, grads, manifolds, eps):
    """Momentum half-step with tangent re-projection on Stiefel leaves."""
    def upd(p, mom, g, man, e):
        sqe = jnp.sqrt(jnp.asarray(e, p.dtype))
        if man == "stiefel":
            return stiefel.project_tangent(p, mom + sqe * g / 2)
        return mom + sqe * g / 2

    leaves_p, treedef = jax.tree.flatten(params)
    return jax.tree.unflatten(
        treedef,
        [
            upd(p, mom, g, man, e)
            for p, mom, g, man, e in zip(
                leaves_p,
                treedef.flatten_up_to(momenta),
                treedef.flatten_up_to(grads),
                treedef.flatten_up_to(manifolds),
                treedef.flatten_up_to(eps),
            )
        ],
    )


def _position_step(params, momenta, manifolds, eps, method="pade"):
    def upd(p, mom, man, e):
        sqe = jnp.sqrt(jnp.asarray(e, p.dtype))
        if man == "stiefel":
            return stiefel.geodesic_with_momentum(p, mom, sqe, method)
        return p + sqe * mom, mom

    leaves_p, treedef = jax.tree.flatten(params)
    pairs = [
        upd(p, mom, man, e)
        for p, mom, man, e in zip(
            leaves_p,
            treedef.flatten_up_to(momenta),
            treedef.flatten_up_to(manifolds),
            treedef.flatten_up_to(eps),
        )
    ]
    new_p = jax.tree.unflatten(treedef, [a for a, _ in pairs])
    new_m = jax.tree.unflatten(treedef, [b for _, b in pairs])
    return new_p, new_m


def run_gmc(
    model,
    params0,
    key: jax.Array,
    phi: jnp.ndarray,
    y: jnp.ndarray,
    *,
    config: GMCConfig,
    burnin: int,
    maxepoch: int,
    collect_fn: Callable | None = None,
):
    """Run one GMC chain; returns (final_params, collected, accept_probs).

    ``accept_probs`` has length ``burnin + maxepoch`` (the reference reports
    the full trace, ``GPT_SGLD.jl:789-797``); ``collected`` holds
    ``collect_fn(params)`` at post-burnin epoch ends (default: the params).
    """
    if collect_fn is None:
        collect_fn = lambda p: p
    manifolds = model.manifolds
    eps = config.eps
    if isinstance(eps, (int, float)):
        eps = jax.tree.map(lambda _: float(eps), params0)

    def logp(p):
        return model.log_lik(p, phi, y) + model.log_prior(p)

    grad_logp = jax.grad(logp)

    def make_leapfrog(L, eps_t):
        def leapfrog(carry, i):
            # The gradient at the step's endpoint is carried to the next
            # iteration — the closing half-kick and the next opening half-kick
            # share one full-data gradient evaluation (L+1 evals total, not 2L;
            # the gradient dominates GMC epoch cost).
            params, momenta, grads = carry
            new_m = _half_step(params, momenta, grads, manifolds, eps_t)
            new_p, new_m = _position_step(params, new_m, manifolds, eps_t,
                                          config.geodesic_method)
            new_g = grad_logp(new_p)
            new_m = _half_step(new_p, new_m, new_g, manifolds, eps_t)
            if L is None:
                return (new_p, new_m, new_g), None
            # jittered trajectory: steps ≥ L are computed but masked out
            take = i < L
            sel = lambda a, b: jax.tree.map(
                lambda x, z: jnp.where(take, x, z), a, b
            )
            return (sel(new_p, params), sel(new_m, momenta), sel(new_g, grads)), None

        return leapfrog

    def epoch_body(carry, e):
        params, k, log_eta, log_eta_bar, h_bar = carry
        # split the extra jitter key ONLY when jitter_steps is on: the
        # 3-way split is the legacy stream of every recorded seeded GMC run
        # (RECORDS.jsonl), which must stay bit-reproducible.
        if config.jitter_steps:
            k, kmom, kacc, kL = jax.random.split(k, 4)
            L = jax.random.randint(kL, (), 1, config.num_leapfrog + 1)
        else:
            k, kmom, kacc = jax.random.split(k, 3)
            L = None
        if config.adapt_step_size:
            # dual averaging on a global multiplier η of √ε: during burn-in
            # the current iterate exp(log_η) (starting at η=1), after burn-in
            # the frozen average exp(log_η̄). eps scales by η².
            eta = jnp.where(e < burnin, jnp.exp(log_eta), jnp.exp(log_eta_bar))
            eps_t = jax.tree.map(lambda x: jnp.asarray(x) * eta**2, eps)
        else:
            eps_t = eps
        momenta = _sample_momenta(kmom, params, manifolds)
        H_old = logp(params) - _kinetic(momenta)
        (prop, prop_mom, _), _ = jax.lax.scan(
            make_leapfrog(L, eps_t), (params, momenta, grad_logp(params)),
            jnp.arange(config.num_leapfrog),
        )
        H_new = logp(prop) - _kinetic(prop_mom)
        log_ratio = jnp.where(jnp.isfinite(H_new), H_new - H_old, -jnp.inf)
        accept_prob = jnp.exp(jnp.minimum(log_ratio, 0.0))
        accept = jax.random.uniform(kacc, ()) < accept_prob
        new_params = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), prop, params
        )
        if config.adapt_step_size:
            it_f = e.astype(jnp.float32) + 1.0
            w_eta = 1.0 / (it_f + jnp.float32(config.t0))
            h_new = (1 - w_eta) * h_bar + w_eta * (
                jnp.float32(config.target_accept) - accept_prob.astype(jnp.float32)
            )
            mu = jnp.float32(jnp.log(10.0))  # shrink toward 10x the base eps
            log_eta_new = mu - jnp.sqrt(it_f) / jnp.float32(config.gamma) * h_new
            pow_ = it_f ** jnp.float32(-config.kappa)
            leb_new = pow_ * log_eta_new + (1 - pow_) * log_eta_bar
            # freeze the iterates once burn-in ends
            adapting = e < burnin
            h_bar = jnp.where(adapting, h_new, h_bar)
            log_eta = jnp.where(adapting, log_eta_new, log_eta)
            log_eta_bar = jnp.where(adapting, leb_new, log_eta_bar)
        return (new_params, k, log_eta, log_eta_bar, h_bar), (
            collect_fn(new_params), accept_prob
        )

    zero = jnp.zeros((), jnp.float32)
    carry0 = (params0, key, zero, zero, zero)
    (final, _, _, log_eta_bar, _), (collected, accept_probs) = jax.lax.scan(
        epoch_body, carry0, jnp.arange(burnin + maxepoch)
    )
    collected = jax.tree.map(lambda a: a[burnin:], collected)
    if config.adapt_step_size:
        return final, collected, accept_probs, jnp.exp(log_eta_bar)
    return final, collected, accept_probs


def run_gmc_chains(
    model,
    params0_chains,
    key: jax.Array,
    phi: jnp.ndarray,
    y: jnp.ndarray,
    *,
    config: GMCConfig,
    burnin: int,
    maxepoch: int,
    collect_fn: Callable | None = None,
    grad_backend: str = "xla",
):
    """Chain-MERGED GMC fleet: every chain advances through ONE program.

    Same per-chain semantics as ``jax.vmap(run_gmc)`` — independent momenta,
    per-chain Hamiltonians/MH tests, per-chain trajectory jitter and
    dual-averaging state — but the fleet's full-data gradient is ONE merged
    evaluation instead of C batched ones. Built for
    ``TensorGP(contraction="merged")``, whose lane-merged matmuls
    ``(N, n) @ (n, C·r)`` are the speed-of-light layout for the GMC hot loop
    (the reference's full-batch gradient, ``GPT_SGLD.jl:684-805``); any model
    whose ``log_lik``/``log_prior`` broadcast over a leading chain axis works.

    ``params0_chains`` leaves carry a leading chain axis C. Returns
    ``(final_params, collected, accept_probs (epochs, C)[, eta_bar (C,)])``.
    PRNG streams differ from the vmapped runner (one fleet key vs per-chain
    keys), so cross-runner agreement is statistical, not bitwise.
    """
    if collect_fn is None:
        collect_fn = lambda p: p
    manifolds = model.manifolds
    event_ndims = model.event_ndims
    C = jax.tree.leaves(params0_chains)[0].shape[0]
    eps = config.eps
    if isinstance(eps, (int, float)):
        eps = jax.tree.map(lambda _: float(eps), params0_chains)

    def sum_trailing(x, ev):
        axes = tuple(range(x.ndim - int(ev), x.ndim))
        return jnp.sum(x, axis=axes)

    def kinetic(momenta):
        """Per-chain kinetic energy → (C,)."""
        leaves, treedef = jax.tree.flatten(momenta)
        evs = treedef.flatten_up_to(event_ndims)
        return sum(sum_trailing(m**2, ev) / 2 for m, ev in zip(leaves, evs))

    def chain_where(cond, a, b):
        """Per-chain select: cond (C,) broadcast over each leaf's event axes."""
        def sel(x, z, ev):
            c = cond.reshape((C,) + (1,) * int(ev))
            return jnp.where(c, x, z)

        leaves_a, treedef = jax.tree.flatten(a)
        return jax.tree.unflatten(
            treedef,
            [
                sel(x, z, ev)
                for x, z, ev in zip(
                    leaves_a,
                    treedef.flatten_up_to(b),
                    treedef.flatten_up_to(event_ndims),
                )
            ],
        )

    def logp(p):
        return model.log_lik(p, phi, y) + model.log_prior(p)  # (C,)

    # chains share no parameters, so grad of the summed log-joint IS the
    # per-chain gradient stack — one merged backward for the whole fleet.
    # grad_backend="pallas" swaps in the fused chunk-streaming kernel
    # (ops.pallas_sgld.make_fused_grad_fn): bf16 likelihood path, VMEM
    # intermediates — MH stays exact because logp above (the accept ratio's
    # only input) keeps the model's own (HIGHEST) precision.
    if grad_backend in ("pallas", "pallas_bf16"):
        from gpt_tpu.ops.pallas_sgld import make_fused_grad_fn

        grad_logp = make_fused_grad_fn(
            model, phi, y, exact=grad_backend == "pallas",
            interpret=jax.default_backend() != "tpu",
        )
    else:
        grad_logp = jax.grad(lambda p: jnp.sum(logp(p)))

    def scale_eps(eps_tree, eta):
        """Per-chain leapfrog eps: each leaf becomes a (C,) array e·η²."""
        return jax.tree.map(lambda e: jnp.asarray(e, jnp.float32) * eta**2,
                            eps_tree)

    def tree_zip(params, *others):
        leaves_p, treedef = jax.tree.flatten(params)
        rest = [treedef.flatten_up_to(o) for o in others]
        return treedef, list(zip(leaves_p, *rest))

    def fleet_half_step(params, momenta, grads, eps_t):
        """Momentum half-step with per-chain (C,) step sizes; the tangent
        re-projection runs lane-merged (project_tangent_fleet)."""
        treedef, rows = tree_zip(params, momenta, grads, manifolds,
                                 event_ndims, eps_t)
        out = []
        for p, mom, g, man, ev, e in rows:
            sqe = jnp.sqrt(e).reshape((C,) + (1,) * int(ev)).astype(p.dtype)
            if man == "stiefel":
                out.append(
                    stiefel.project_tangent_fleet(p, mom + sqe * g / 2))
            else:
                out.append(mom + sqe * g / 2)
        return jax.tree.unflatten(treedef, out)

    def fleet_position_step(params, momenta, eps_t):
        """Position step with per-chain (C,) geodesic times.

        Stiefel leaves are (C, ..., n, r); the geodesic's time argument must
        carry the leaf's MATRIX-batch shape (chain axis + any factor axes
        before the final (n, r)), broadcast from (C,)."""
        treedef, rows = tree_zip(params, momenta, manifolds, eps_t)
        new_p, new_m = [], []
        for p, mom, man, e in rows:
            if man == "stiefel":
                t = jnp.sqrt(e).reshape((C,) + (1,) * (p.ndim - 3))
                a, b = stiefel.geodesic_with_momentum(
                    p, mom, jnp.broadcast_to(t, p.shape[:-2]).astype(p.dtype),
                    config.geodesic_method,
                )
            else:
                sqe = jnp.sqrt(e).reshape((C,) + (1,) * (p.ndim - 1))
                a, b = p + sqe.astype(p.dtype) * mom, mom
            new_p.append(a)
            new_m.append(b)
        return (jax.tree.unflatten(treedef, new_p),
                jax.tree.unflatten(treedef, new_m))

    def leapfrog(carry, i):
        # endpoint gradient carried to the next iteration: L+1 evals, not 2L
        params, momenta, grads, L, eps_t = carry
        new_m = fleet_half_step(params, momenta, grads, eps_t)
        new_p, new_m = fleet_position_step(params, new_m, eps_t)
        new_g = grad_logp(new_p)
        new_m = fleet_half_step(new_p, new_m, new_g, eps_t)
        if L is None:
            return (new_p, new_m, new_g, L, eps_t), None
        take = i < L  # (C,) — per-chain jittered trajectory lengths
        return (
            chain_where(take, new_p, params),
            chain_where(take, new_m, momenta),
            chain_where(take, new_g, grads),
            L,
            eps_t,
        ), None

    def epoch_body(carry, e):
        params, k, log_eta, log_eta_bar, h_bar = carry
        if config.jitter_steps:
            k, kmom, kacc, kL = jax.random.split(k, 4)
            L = jax.random.randint(kL, (C,), 1, config.num_leapfrog + 1)
        else:
            k, kmom, kacc = jax.random.split(k, 3)
            L = None
        if config.adapt_step_size:
            eta = jnp.where(e < burnin, jnp.exp(log_eta), jnp.exp(log_eta_bar))
            eps_t = scale_eps(eps, eta)  # per-chain (C,) eps leaves
        else:
            eps_t = scale_eps(eps, jnp.ones((C,), jnp.float32))
        momenta = _sample_momenta(kmom, params, manifolds)
        H_old = logp(params) - kinetic(momenta)  # (C,)
        (prop, prop_mom, _, _, _), _ = jax.lax.scan(
            leapfrog, (params, momenta, grad_logp(params), L, eps_t),
            jnp.arange(config.num_leapfrog),
        )
        H_new = logp(prop) - kinetic(prop_mom)
        log_ratio = jnp.where(jnp.isfinite(H_new), H_new - H_old, -jnp.inf)
        accept_prob = jnp.exp(jnp.minimum(log_ratio, 0.0))  # (C,)
        accept = jax.random.uniform(kacc, (C,)) < accept_prob
        new_params = chain_where(accept, prop, params)
        if config.adapt_step_size:
            it_f = e.astype(jnp.float32) + 1.0
            w_eta = 1.0 / (it_f + jnp.float32(config.t0))
            h_new = (1 - w_eta) * h_bar + w_eta * (
                jnp.float32(config.target_accept)
                - accept_prob.astype(jnp.float32)
            )
            mu = jnp.float32(jnp.log(10.0))
            log_eta_new = (
                mu - jnp.sqrt(it_f) / jnp.float32(config.gamma) * h_new
            ).astype(jnp.float32)
            pow_ = it_f ** jnp.float32(-config.kappa)
            leb_new = (pow_ * log_eta_new + (1 - pow_) * log_eta_bar).astype(
                jnp.float32
            )
            adapting = e < burnin
            h_bar = jnp.where(adapting, h_new, h_bar)
            log_eta = jnp.where(adapting, log_eta_new, log_eta)
            log_eta_bar = jnp.where(adapting, leb_new, log_eta_bar)
        return (new_params, k, log_eta, log_eta_bar, h_bar), (
            collect_fn(new_params), accept_prob
        )

    zeros = jnp.zeros((C,), jnp.float32)
    carry0 = (params0_chains, key, zeros, zeros, zeros)
    (final, _, _, log_eta_bar, _), (collected, accept_probs) = jax.lax.scan(
        epoch_body, carry0, jnp.arange(burnin + maxepoch)
    )
    collected = jax.tree.map(lambda a: a[burnin:], collected)
    if config.adapt_step_size:
        return final, collected, accept_probs, jnp.exp(log_eta_bar)
    return final, collected, accept_probs
