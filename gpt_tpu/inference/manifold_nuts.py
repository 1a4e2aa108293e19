"""Manifold NUTS — dynamic trajectory lengths for geodesic Monte Carlo (L3/L6).

The reference's manifold sampler (``GPT_GMC``, ``GPT_SGLD.jl:684-805``) is
fixed-L; its dynamic-trajectory gold standards (Stan/Mamba NUTS) are
Euclidean-only — Stan cannot sample Stiefel manifolds, which is why
``california/tensor2d.stan:29-35`` relaxes the factors to Gaussian priors.
This module goes past that parity point: the iterative multinomial NUTS
machinery (``inference/nuts.py`` — boundary-stack U-turn checks, biased
progressive sampling, dual-averaging warmup) driven by the GEODESIC leapfrog
of ``inference/gmc.py``:

    p   += v·τ_leaf · ∇ logπ / 2      (tangent-projected on Stiefel leaves)
    q   ←  geodesic flow for time v·τ_leaf (momentum parallel-transported)
    p   += v·τ_leaf · ∇ logπ / 2

TPU-first: positions/momenta ravel to flat vectors for the boundary stack and
U-turn inner products (the embedded-space ⟨Δq, p⟩ criterion — the standard
manifold generalisation; any deterministic symmetric stopping rule preserves
multinomial-NUTS correctness), while the integrator itself runs on the
structured pytree with matmul-only Taylor geodesics. Per-leaf time scales
``τ_leaf = step_size·√(eps_leaf)`` play the role of a diagonal mass matrix,
with dual averaging adapting the global ``step_size``.

Momentum is ``proj_U(ξ)``, ξ ~ N(0, I): the isotropic Gaussian restricted to
the tangent space, whose negative log-density is ‖p‖²/2 — so the Euclidean
kinetic term in the NUTS weights is exact (Byrne & Girolami 2013's GMC
measure argument).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from gpt_tpu.inference.nuts import (
    NUTSConfig,
    _nuts_transition,
    _nuts_transition_fleet,
)
from gpt_tpu.utils import stiefel


def run_manifold_nuts(
    model,
    params0: Any,
    key: jax.Array,
    phi: jnp.ndarray,
    y: jnp.ndarray,
    *,
    eps: Any,
    num_warmup: int,
    num_samples: int,
    config: NUTSConfig = NUTSConfig(init_step_size=1.0),
    collect_fn: Callable | None = None,
    geodesic_method: str = "taylor",
):
    """Run one manifold-NUTS chain on a tensor-GP-style model.

    ``eps`` is the GMC-style per-leaf base step (pytree prefix, e.g.
    ``TensorGPParams(w=1e-4, U=1e-7)``); NUTS adapts a global multiplier on
    ``√eps`` by dual averaging. Returns ``(samples, stats, step_size)`` like
    :func:`gpt_tpu.inference.nuts.run_nuts`; ``stats["n_leapfrog"]`` is the
    per-draw gradient cost for ESS/gradient comparisons against fixed-L GMC.
    vmap over chains as usual.
    """
    if collect_fn is None:
        collect_fn = lambda q: q
    manifolds = model.manifolds
    if isinstance(eps, (int, float)):
        eps = jax.tree.map(lambda _: float(eps), params0)

    q0_flat, unravel = ravel_pytree(params0)
    dtype = q0_flat.dtype

    def logp(params):
        return jnp.sum(model.log_lik(params, phi, y) + model.log_prior(params))

    def logp_and_grad(q):
        val, g = jax.value_and_grad(lambda x: logp(unravel(x)))(q)
        return val.astype(dtype), g.astype(dtype)

    # per-leaf τ template (the diagonal "mass"): flat vector of √eps_leaf
    leaves_p, treedef = jax.tree.flatten(params0)
    leaves_e = treedef.flatten_up_to(eps)
    tau_tree = jax.tree.unflatten(
        treedef,
        [jnp.full_like(p, jnp.sqrt(jnp.asarray(e, p.dtype)))
         for p, e in zip(leaves_p, leaves_e)],
    )

    def struct(q):
        return unravel(q)

    def flat(tree):
        return ravel_pytree(tree)[0]

    def half_kick(params, mom, grads, t_dir):
        def upd(p, m, g, man, tau):
            m2 = m + (t_dir * tau) * g / 2
            if man == "stiefel":
                return stiefel.project_tangent(p, m2)
            return m2

        rows = zip(
            jax.tree.leaves(params),
            treedef.flatten_up_to(mom),
            treedef.flatten_up_to(grads),
            treedef.flatten_up_to(manifolds),
            treedef.flatten_up_to(tau_tree),
        )
        return jax.tree.unflatten(treedef, [upd(*r) for r in rows])

    def position(params, mom, t_dir):
        def upd(p, m, man, tau):
            if man == "stiefel":
                # tau is constant within a leaf; the geodesic time must
                # carry the leaf's matrix-batch shape
                tb = jnp.broadcast_to(t_dir * tau.reshape(-1)[0],
                                      p.shape[:-2])
                return stiefel.geodesic_with_momentum(p, m, tb, geodesic_method)
            return p + (t_dir * tau) * m, m

        rows = list(zip(
            jax.tree.leaves(params),
            treedef.flatten_up_to(mom),
            treedef.flatten_up_to(manifolds),
            treedef.flatten_up_to(tau_tree),
        ))
        outs = [upd(*r) for r in rows]
        return (jax.tree.unflatten(treedef, [a for a, _ in outs]),
                jax.tree.unflatten(treedef, [b for _, b in outs]))

    def leapfrog_fn(q, p, g, v, step_size):
        t_dir = v * step_size
        params, mom, grads = struct(q), struct(p), struct(g)
        mom = half_kick(params, mom, grads, t_dir)
        params, mom = position(params, mom, t_dir)
        gval, gnew = jax.value_and_grad(logp)(params)
        mom = half_kick(params, mom, gnew, t_dir)
        return (flat(params), flat(mom), flat(gnew).astype(dtype),
                gval.astype(dtype))

    def sample_momentum(kmom, q):
        params = struct(q)
        noise = jax.random.normal(kmom, q.shape, dtype)
        ntree = struct(noise)

        def proj(p, m, man):
            return stiefel.project_tangent(p, m) if man == "stiefel" else m

        rows = zip(jax.tree.leaves(params), treedef.flatten_up_to(ntree),
                   treedef.flatten_up_to(manifolds))
        return flat(jax.tree.unflatten(treedef, [proj(*r) for r in rows]))

    logp0, g0 = logp_and_grad(q0_flat)

    def transition(carry, adapt):
        (q, lp, g, k, log_eps, log_eps_bar, h_bar, it) = carry
        k, kt = jax.random.split(k)
        step_size = jnp.exp(jnp.where(adapt, log_eps, log_eps_bar))
        q, lp, g, accept_stat, n_lf, div = _nuts_transition(
            logp_and_grad, q, lp, g, kt, step_size, config,
            leapfrog_fn=leapfrog_fn, sample_momentum=sample_momentum,
        )
        it = it + 1
        it_f = it.astype(jnp.float32)
        mu = jnp.float32(jnp.log(10.0 * config.init_step_size))
        eta = 1.0 / (it_f + jnp.float32(config.t0))
        h_new = (1 - eta) * h_bar + eta * (
            jnp.float32(config.target_accept) - accept_stat.astype(jnp.float32)
        )
        log_eps_new = mu - jnp.sqrt(it_f) / jnp.float32(config.gamma) * h_new
        pow_ = it_f ** jnp.float32(-config.kappa)
        leb_new = pow_ * log_eps_new + (1 - pow_) * log_eps_bar
        h_bar = jnp.where(adapt, h_new, h_bar)
        log_eps = jnp.where(adapt, log_eps_new, log_eps)
        log_eps_bar = jnp.where(adapt, leb_new, log_eps_bar)
        return (q, lp, g, k, log_eps, log_eps_bar, h_bar, it), (
            accept_stat, n_lf, div
        )

    le0 = jnp.log(jnp.asarray(config.init_step_size, jnp.float32))
    carry = (q0_flat, logp0, g0, key, le0, le0, jnp.zeros((), jnp.float32),
             jnp.zeros((), jnp.int32))

    def warm_body(c, _):
        c, _stats = transition(c, adapt=jnp.asarray(True))
        return c, None

    carry, _ = jax.lax.scan(warm_body, carry, None, length=num_warmup)

    def sample_body(c, _):
        c, stats = transition(c, adapt=jnp.asarray(False))
        return c, (collect_fn(unravel(c[0])), stats)

    carry, (samples, (acc, n_lf, div)) = jax.lax.scan(
        sample_body, carry, None, length=num_samples
    )
    stats = {"accept_stat": acc, "n_leapfrog": n_lf, "diverged": div}
    return samples, stats, jnp.exp(carry[5])


def _identity_collect(q):
    return q


def run_manifold_nuts_chains(
    model,
    params0_chains: Any,
    key: jax.Array,
    phi: jnp.ndarray,
    y: jnp.ndarray,
    *,
    eps: Any,
    num_warmup: int,
    num_samples: int,
    config: NUTSConfig = NUTSConfig(init_step_size=1.0),
    collect_fn: Callable | None = None,
    geodesic_method: str = "taylor",
    grad_backend: str = "xla",
    step_size0: jnp.ndarray | None = None,
):
    """Chain-MERGED manifold-NUTS fleet: every tree leaf is ONE merged
    fleet gradient (the ``run_gmc_chains`` recipe applied to dynamic
    trajectories).

    Built for ``TensorGP(contraction="merged")``: C chains' geodesic-NUTS
    trees advance in lockstep through shared-φ lane-merged matmuls
    ``(N, n) @ (n, C·r)`` — the GMC merged fleet's speed-of-light layout —
    with per-chain U-turn stopping, multinomial proposals, and dual-averaged
    step sizes. This is the engine the slow subspace-rotation directions
    (w², |U_dᵀv| probes, RECORDS ``gmc_multichain_diagnostics``) need at
    convergence-run budgets: manifold NUTS mixes those directions best per
    draw (RECORDS ``manifold_nuts_vs_gmc``) and the merged fleet makes its
    255-gradient draws affordable.

    ``params0_chains`` leaves carry a leading chain axis C.
    ``grad_backend="pallas"`` swaps leaf gradients to the fused
    chunk-streaming kernel (exact f32 forces — NUTS weights are an MH-exact
    consumer) with the multinomial-weight log-density as a separate merged
    forward. ``step_size0`` (per-chain ``(C,)``) seeds the dual-averaging
    state — pass a previous segment's adapted steps to continue a SEGMENTED
    run (the tunnelled chip kills single dispatches past ~2 min, so
    convergence runs chain ``(params, step_size)`` across dispatches; with
    ``num_warmup=0`` the chains sample at exactly ``step_size0``, each a
    valid fixed-step sampler with detailed balance intact).

    Returns ``(samples, stats, step_size, final_params)`` with per-chain
    axes: samples leaves ``(num_samples, C, ...)``, stats arrays
    ``(num_samples, C)``, ``step_size (C,)``. PRNG streams differ from
    ``vmap(run_manifold_nuts)`` (one fleet key; lockstep uniforms), so
    cross-runner agreement is statistical, not bitwise.
    """
    if collect_fn is None:
        collect_fn = lambda q: q
    manifolds = model.manifolds
    C = jax.tree.leaves(params0_chains)[0].shape[0]
    if isinstance(eps, (int, float)):
        eps = jax.tree.map(lambda _: float(eps),
                           jax.tree.map(lambda a: a[0], params0_chains))

    # fleet ravel/unravel: per-chain flat vectors stacked to (C, dim)
    chain0 = jax.tree.map(lambda a: a[0], params0_chains)
    _, unravel_chain = ravel_pytree(chain0)
    unravel_fleet = jax.vmap(unravel_chain)
    flat_fleet = jax.vmap(lambda t: ravel_pytree(t)[0])
    q0 = flat_fleet(params0_chains)                       # (C, dim)
    dtype = q0.dtype

    leaves_p, treedef = jax.tree.flatten(chain0)
    leaves_e = treedef.flatten_up_to(eps)
    tau_leaves = [jnp.sqrt(jnp.asarray(e, jnp.float32)) for e in leaves_e]

    def logp(params):
        return model.log_lik(params, phi, y) + model.log_prior(params)  # (C,)

    def logp_and_grad_struct(params):
        """(logp (C,), grads fleet-tree) — one merged fwd+bwd."""
        (_, lp), grads = jax.value_and_grad(
            lambda p: (jnp.sum(logp(p)), logp(p)), has_aux=True
        )(params)
        return lp, grads

    if grad_backend in ("pallas", "pallas_bf16"):
        from gpt_tpu.ops.pallas_sgld import make_fused_grad_fn

        fused_grad = make_fused_grad_fn(
            model, phi, y, exact=grad_backend == "pallas",
            interpret=jax.default_backend() != "tpu",
        )

        def logp_and_grad_struct(params):  # noqa: F811 — backend override
            return logp(params), fused_grad(params)

    def logp_and_grad(q):
        lp, g = logp_and_grad_struct(unravel_fleet(q))
        return lp.astype(dtype), flat_fleet(g).astype(dtype)

    def fleet_half_kick(params, mom, grads, t_dir):
        """Per-chain momentum half-kick; Stiefel leaves re-projected with the
        lane-merged fleet projection."""
        rows = zip(
            jax.tree.leaves(params),
            treedef.flatten_up_to(mom),
            treedef.flatten_up_to(grads),
            treedef.flatten_up_to(manifolds),
            tau_leaves,
        )
        out = []
        for p, m, g, man, tau in rows:
            td = t_dir.reshape((C,) + (1,) * (p.ndim - 1)).astype(p.dtype)
            m2 = m + (td * tau) * g / 2
            if man == "stiefel":
                m2 = stiefel.project_tangent_fleet(p, m2)
            out.append(m2)
        return jax.tree.unflatten(treedef, out)

    def fleet_position(params, mom, t_dir):
        rows = zip(
            jax.tree.leaves(params),
            treedef.flatten_up_to(mom),
            treedef.flatten_up_to(manifolds),
            tau_leaves,
        )
        new_p, new_m = [], []
        for p, m, man, tau in rows:
            if man == "stiefel":
                tb = (t_dir * tau).reshape((C,) + (1,) * (p.ndim - 3))
                a, b = stiefel.geodesic_with_momentum(
                    p, m, jnp.broadcast_to(tb, p.shape[:-2]).astype(p.dtype),
                    geodesic_method,
                )
            else:
                td = t_dir.reshape((C,) + (1,) * (p.ndim - 1)).astype(p.dtype)
                a, b = p + (td * tau) * m, m
            new_p.append(a)
            new_m.append(b)
        return (jax.tree.unflatten(treedef, new_p),
                jax.tree.unflatten(treedef, new_m))

    def leapfrog_fn(q, p, g, v, step_size):
        t_dir = v * step_size                              # (C,)
        params, mom, grads = unravel_fleet(q), unravel_fleet(p), unravel_fleet(g)
        mom = fleet_half_kick(params, mom, grads, t_dir)
        params, mom = fleet_position(params, mom, t_dir)
        lp, gnew = logp_and_grad_struct(params)
        mom = fleet_half_kick(params, mom, gnew, t_dir)
        return (flat_fleet(params), flat_fleet(mom),
                flat_fleet(gnew).astype(dtype), lp.astype(dtype))

    def sample_momentum(kmom, q):
        params = unravel_fleet(q)
        ntree = unravel_fleet(jax.random.normal(kmom, q.shape, dtype))
        rows = zip(jax.tree.leaves(params), treedef.flatten_up_to(ntree),
                   treedef.flatten_up_to(manifolds))
        out = [
            stiefel.project_tangent_fleet(p, m) if man == "stiefel" else m
            for p, m, man in rows
        ]
        return flat_fleet(jax.tree.unflatten(treedef, out))

    logp0, g0 = logp_and_grad(q0)

    def transition(carry, adapt):
        (q, lp, g, k, log_eps, log_eps_bar, h_bar, it) = carry
        k, kt = jax.random.split(k)
        step_size = jnp.exp(jnp.where(adapt, log_eps, log_eps_bar))  # (C,)
        q, lp, g, accept_stat, n_lf, div = _nuts_transition_fleet(
            logp_and_grad, q, lp, g, kt, step_size, config,
            leapfrog_fn=leapfrog_fn, sample_momentum=sample_momentum,
        )
        # per-chain dual averaging (each chain tunes its own multiplier);
        # the shrink anchor mu is per-chain: 10x each chain's initial step
        it = it + 1
        it_f = it.astype(jnp.float32)
        eta = 1.0 / (it_f + jnp.float32(config.t0))
        h_new = (1 - eta) * h_bar + eta * (
            jnp.float32(config.target_accept) - accept_stat.astype(jnp.float32)
        )
        log_eps_new = mu - jnp.sqrt(it_f) / jnp.float32(config.gamma) * h_new
        pow_ = it_f ** jnp.float32(-config.kappa)
        leb_new = pow_ * log_eps_new + (1 - pow_) * log_eps_bar
        h_bar = jnp.where(adapt, h_new, h_bar)
        log_eps = jnp.where(adapt, log_eps_new, log_eps)
        log_eps_bar = jnp.where(adapt, leb_new, log_eps_bar)
        return (q, lp, g, k, log_eps, log_eps_bar, h_bar, it), (
            accept_stat, n_lf, div
        )

    if step_size0 is None:
        le0 = jnp.full((C,), jnp.log(jnp.float32(config.init_step_size)),
                       jnp.float32)
    else:
        le0 = jnp.log(jnp.asarray(step_size0, jnp.float32).reshape(C))
    mu = jnp.float32(jnp.log(10.0)) + le0
    carry = (q0, logp0, g0, key, le0, le0, jnp.zeros((C,), jnp.float32),
             jnp.zeros((), jnp.int32))

    def warm_body(c, _):
        c, _stats = transition(c, adapt=jnp.asarray(True))
        return c, None

    carry, _ = jax.lax.scan(warm_body, carry, None, length=num_warmup)

    def sample_body(c, _):
        c, stats = transition(c, adapt=jnp.asarray(False))
        return c, (collect_fn(unravel_fleet(c[0])), stats)

    carry, (samples, (acc, n_lf, div)) = jax.lax.scan(
        sample_body, carry, None, length=num_samples
    )
    stats = {"accept_stat": acc, "n_leapfrog": n_lf, "diverged": div}
    # final params ride along so segmented runs can chain dispatches
    return samples, stats, jnp.exp(carry[5]), unravel_fleet(carry[0])
