"""No-U-Turn Sampler — dynamic-trajectory gold-standard engine (L6).

The reference's gold standards are NUTS runs in external engines: CmdStan
(``StanFullTheta.jl:6-51``, ``california/fulltheta.r``,
``temperature_uk/tensor2d_kron.r``) and Mamba NUTS
(``ImageExperiment.jl:223-283``). This module is the in-framework
replacement: multinomial NUTS (Betancourt 2017 flavour of Hoffman & Gelman
2014) with Stan-style dual-averaging step-size warmup.

TPU-first design:

- **Iterative tree building** (Phan & Pradhan's scheme): a NUTS trajectory is
  a balanced binary tree over leapfrog steps; instead of recursion (which
  cannot jit), each doubling simulates its 2^d steps one at a time while a
  (max_depth+1)-slot boundary stack supports every sub-tree U-turn check.
  Node i (even, in-subtree index) is stored at slot ctz(i) (slot d for the
  subtree root i=0); after odd node i, the blocks ending at i (sizes 2^b,
  b = 1..trailing_ones(i)) are checked against their stored start states.
  Everything is ``lax.while_loop``/``fori_loop`` — one compiled program, no
  data-dependent Python.
- **Raveled state**: positions/momenta are flattened to vectors
  (``ravel_pytree``) so the boundary stack is a dense (max_depth+1, dim)
  array and U-turn dots are single reductions; unravel only at the
  user-facing boundary.
- **Multinomial progressive sampling**: within a subtree the proposal is
  streamed (node i replaces the running proposal with probability
  w_i / W_{0..i}); across subtrees the biased-progressive rule
  min(1, W_new/W_old) favours later doublings (Betancourt's variant, what
  Stan implements).
- Divergence at ΔH < -1000 nats; the diverging subtree is discarded whole,
  as in Stan.

Validated against exact conjugate posteriors and the independent torch
engine in ``tests/test_nuts.py``; ESS-per-gradient compared with fixed-L HMC.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


@dataclasses.dataclass(frozen=True)
class NUTSConfig:
    max_depth: int = 8
    target_accept: float = 0.8
    init_step_size: float = 0.1
    max_delta_energy: float = 1000.0
    # dual-averaging constants (Stan defaults)
    gamma: float = 0.05
    t0: float = 10.0
    kappa: float = 0.75


class _Tree(NamedTuple):
    """Carry for one NUTS transition's outer (doubling) loop."""
    key: jax.Array
    depth: jnp.ndarray
    q_left: jnp.ndarray
    p_left: jnp.ndarray
    g_left: jnp.ndarray
    q_right: jnp.ndarray
    p_right: jnp.ndarray
    g_right: jnp.ndarray
    q_prop: jnp.ndarray
    log_w: jnp.ndarray       # log total multinomial weight of the trajectory
    turning: jnp.ndarray
    diverged: jnp.ndarray
    sum_alpha: jnp.ndarray   # Σ min(1, exp(ΔH)) over visited nodes
    n_alpha: jnp.ndarray
    n_leapfrog: jnp.ndarray


def _ctz(i: jnp.ndarray) -> jnp.ndarray:
    """Count trailing zeros of a positive int32."""
    return jax.lax.population_count((i & -i) - 1)


def _nuts_transition(logp_and_grad, q0, logp0, g0, key, step_size, config,
                     leapfrog_fn=None, sample_momentum=None):
    """One NUTS transition on raveled vectors. Returns
    (q_new, logp_new, g_new, accept_stat, n_leapfrog, diverged).

    ``leapfrog_fn(q, p, g, v, step_size) -> (q, p, g, logp)`` and
    ``sample_momentum(key, q) -> p`` inject a non-Euclidean integrator over
    the SAME raveled representation (the boundary stack, U-turn dots and
    multinomial weights are geometry-agnostic given tangent momenta) — used
    by :mod:`gpt_tpu.inference.manifold_nuts` for geodesic dynamics on
    Stiefel products. Defaults reproduce the Euclidean sampler bit-for-bit.
    """
    dim = q0.shape[0]
    md = config.max_depth
    kmom, kloop = jax.random.split(key)
    if sample_momentum is None:
        p0 = jax.random.normal(kmom, (dim,), q0.dtype)
    else:
        p0 = sample_momentum(kmom, q0)
    H0 = logp0 - 0.5 * jnp.dot(p0, p0)

    if leapfrog_fn is None:
        def leapfrog(q, p, g, v):
            eps = v * step_size
            p_half = p + 0.5 * eps * g
            q_new = q + eps * p_half
            logp_new, g_new = logp_and_grad(q_new)
            p_new = p_half + 0.5 * eps * g_new
            return q_new, p_new, g_new, logp_new
    else:
        def leapfrog(q, p, g, v):
            return leapfrog_fn(q, p, g, v, step_size)

    def build_subtree(key, depth, z_start, v):
        """Simulate 2^depth leapfrog steps from z_start along direction v.

        Returns (z_end, sub_prop, log_sub_w, turning, diverged,
        sum_alpha, n_done).
        """
        q_s, p_s, g_s = z_start
        stack_q = jnp.zeros((md + 1, dim), q_s.dtype)
        stack_p = jnp.zeros((md + 1, dim), q_s.dtype)
        n_total = jnp.int32(1) << depth

        def cond(c):
            i = c[0]
            return (i < n_total) & ~c[8] & ~c[9]

        def body(c):
            (i, key, q, p, g, prop, log_sub_w, _sa, turning, diverged,
             sq, sp) = c
            key, ku = jax.random.split(key)
            q, p, g, logp = leapfrog(q, p, g, v)
            logw = logp - 0.5 * jnp.dot(p, p) - H0
            diverged = diverged | (logw < -config.max_delta_energy) | ~jnp.isfinite(logw)
            # progressive multinomial proposal within the subtree
            new_log_sub_w = jnp.logaddexp(log_sub_w, logw)
            take = jnp.log(jax.random.uniform(ku, (), q.dtype)) < logw - new_log_sub_w
            prop = jnp.where(take, q, prop)
            alpha = jnp.minimum(1.0, jnp.exp(logw))
            # boundary stack: store even nodes, check blocks ending at odd i
            is_even = (i % 2) == 0
            slot = jnp.where(i == 0, depth, _ctz(jnp.maximum(i, 1)))
            sq = jnp.where(is_even, sq.at[slot].set(q), sq)
            sp = jnp.where(is_even, sp.at[slot].set(p), sp)

            def check_block(b, turning):
                start = i + 1 - (jnp.int32(1) << b)
                active = (~is_even) & (b <= _ctz(i + 1)) & (b >= 1)
                slot_b = jnp.where(start == 0, depth,
                                   _ctz(jnp.maximum(start, 1)))
                q_a = sq[slot_b]
                p_a = sp[slot_b]
                dq = v * (q - q_a)
                turn_b = (jnp.dot(dq, p_a) < 0) | (jnp.dot(dq, p) < 0)
                return turning | (active & turn_b)

            turning = jax.lax.fori_loop(1, md + 1, check_block, turning)
            return (i + 1, key, q, p, g, prop, new_log_sub_w,
                    _sa + alpha, turning, diverged, sq, sp)

        init = (jnp.int32(0), key, q_s, p_s, g_s, q_s,
                jnp.asarray(-jnp.inf, q_s.dtype), jnp.zeros((), q_s.dtype),
                jnp.asarray(False), jnp.asarray(False), stack_q, stack_p)
        (i, _, q, p, g, prop, log_sub_w, sum_alpha, turning, diverged,
         _, _) = jax.lax.while_loop(cond, body, init)
        return (q, p, g), prop, log_sub_w, turning, diverged, sum_alpha, i

    def outer_cond(t: _Tree):
        return (t.depth < md) & ~t.turning & ~t.diverged

    def outer_body(t: _Tree) -> _Tree:
        key, kv, kacc, ksub = jax.random.split(t.key, 4)
        v = jnp.where(jax.random.bernoulli(kv), 1.0, -1.0).astype(q0.dtype)
        z_start = jax.tree.map(
            lambda a, b: jnp.where(v > 0, a, b),
            (t.q_right, t.p_right, t.g_right),
            (t.q_left, t.p_left, t.g_left),
        )
        (z_end, prop, log_sub_w, sub_turn, sub_div, sum_alpha, n_sub) = (
            build_subtree(ksub, t.depth, z_start, v)
        )
        q_e, p_e, g_e = z_end
        bad = sub_turn | sub_div
        # biased progressive sampling across subtrees (Stan's rule)
        take = (~bad) & (
            jnp.log(jax.random.uniform(kacc, (), q0.dtype))
            < log_sub_w - t.log_w
        )
        q_prop = jnp.where(take, prop, t.q_prop)
        log_w = jnp.where(bad, t.log_w, jnp.logaddexp(t.log_w, log_sub_w))
        # merge endpoints (only if the subtree is kept)
        keep = ~bad
        sel = lambda new, old: jnp.where(keep, new, old)
        q_left = jnp.where(v > 0, t.q_left, sel(q_e, t.q_left))
        p_left = jnp.where(v > 0, t.p_left, sel(p_e, t.p_left))
        g_left = jnp.where(v > 0, t.g_left, sel(g_e, t.g_left))
        q_right = jnp.where(v > 0, sel(q_e, t.q_right), t.q_right)
        p_right = jnp.where(v > 0, sel(p_e, t.p_right), t.p_right)
        g_right = jnp.where(v > 0, sel(g_e, t.g_right), t.g_right)
        # global U-turn across the merged trajectory
        dq = q_right - q_left
        glob_turn = (jnp.dot(dq, p_left) < 0) | (jnp.dot(dq, p_right) < 0)
        return _Tree(
            key=key,
            depth=t.depth + 1,
            q_left=q_left, p_left=p_left, g_left=g_left,
            q_right=q_right, p_right=p_right, g_right=g_right,
            q_prop=q_prop,
            log_w=log_w,
            turning=t.turning | sub_turn | (keep & glob_turn),
            diverged=t.diverged | sub_div,
            sum_alpha=t.sum_alpha + sum_alpha,
            n_alpha=t.n_alpha + n_sub.astype(jnp.float32),
            n_leapfrog=t.n_leapfrog + n_sub,
        )

    t0 = _Tree(
        key=kloop,
        depth=jnp.int32(0),
        q_left=q0, p_left=p0, g_left=g0,
        q_right=q0, p_right=p0, g_right=g0,
        q_prop=q0,
        log_w=jnp.zeros((), q0.dtype),
        turning=jnp.asarray(False),
        diverged=jnp.asarray(False),
        sum_alpha=jnp.zeros((), q0.dtype),
        n_alpha=jnp.zeros((), jnp.float32),
        n_leapfrog=jnp.int32(0),
    )
    t = jax.lax.while_loop(outer_cond, outer_body, t0)
    logp_new, g_new = logp_and_grad(t.q_prop)
    accept_stat = t.sum_alpha / jnp.maximum(t.n_alpha, 1.0)
    return t.q_prop, logp_new, g_new, accept_stat, t.n_leapfrog, t.diverged


class _TreeFleet(NamedTuple):
    """Carry for the chain-merged transition's outer (doubling) loop.

    ``depth`` is GLOBAL (all chains double in lockstep); everything else is
    per-chain: vectors are (C, dim), scalars (C,).
    """
    key: jax.Array
    depth: jnp.ndarray
    q_left: jnp.ndarray
    p_left: jnp.ndarray
    g_left: jnp.ndarray
    q_right: jnp.ndarray
    p_right: jnp.ndarray
    g_right: jnp.ndarray
    q_prop: jnp.ndarray
    log_w: jnp.ndarray
    turning: jnp.ndarray
    diverged: jnp.ndarray
    sum_alpha: jnp.ndarray
    n_alpha: jnp.ndarray
    n_leapfrog: jnp.ndarray


def _nuts_transition_fleet(logp_and_grad, q0, logp0, g0, key, step_size,
                           config, leapfrog_fn, sample_momentum):
    """Chain-MERGED NUTS transition: C chains build their trees in lockstep so
    every tree leaf costs ONE merged fleet gradient instead of C small ones.

    Per-chain semantics are identical to ``vmap(_nuts_transition)`` — each
    chain doubles until ITS OWN U-turn/divergence (frozen thereafter, its
    lanes masked), keeps its own multinomial proposal, momenta and
    dual-averaging statistics — only the execution schedule and the PRNG
    stream differ. The payoff mirrors ``gmc.run_gmc_chains``: with
    ``TensorGP(contraction="merged")`` the full-data gradient at every leapfrog
    leaf is one (N, n) @ (n, C·r) lane-merged program (the shapes the MXU
    wants) rather than C dispatch-bound (n, r) matmuls. Lockstep waste is
    bounded: a chain that stops at doubling d idles for the remaining
    doublings, but on posteriors whose U-turn scale exceeds the tree span
    (the tensor-GP regime — RECORDS ``manifold_nuts_vs_gmc``: trees saturate
    max_depth) chains almost never stop early, so the masked-lane overhead is
    near zero.

    Args: ``q0 (C, dim)``, ``logp0 (C,)``, ``g0 (C, dim)``,
    ``step_size (C,)`` (per-chain, dual-averaged by the caller);
    ``leapfrog_fn(q, p, g, v, step_size) -> (q, p, g, logp)`` with
    ``v (C,)`` ∈ {±1}; ``sample_momentum(key, q) -> p``.
    Returns per-chain ``(q, logp, g, accept_stat, n_leapfrog, diverged)``.
    """
    C, dim = q0.shape
    md = config.max_depth
    kmom, kloop = jax.random.split(key)
    p0 = sample_momentum(kmom, q0)

    def rowdot(a, b):
        return jnp.sum(a * b, axis=-1)

    H0 = logp0 - 0.5 * rowdot(p0, p0)  # (C,)

    def leapfrog(q, p, g, v):
        return leapfrog_fn(q, p, g, v, step_size)

    def build_subtree(key, depth, z_start, v, active):
        """Simulate 2^depth lockstep leapfrogs from z_start along per-chain
        direction v; chains outside ``active`` (or stopping mid-subtree) are
        frozen. Returns per-chain (z_end, prop, log_sub_w, turning, diverged,
        sum_alpha, n_done)."""
        q_s, p_s, g_s = z_start
        stack_q = jnp.zeros((md + 1, C, dim), q_s.dtype)
        stack_p = jnp.zeros((md + 1, C, dim), q_s.dtype)
        n_total = jnp.int32(1) << depth

        def cond(c):
            i, turning, diverged = c[0], c[8], c[9]
            return (i < n_total) & jnp.any(active & ~turning & ~diverged)

        def body(c):
            (i, key, q, p, g, prop, log_sub_w, sa, turning, diverged,
             sq, sp, n_done) = c
            key, ku = jax.random.split(key)
            run = active & ~turning & ~diverged           # (C,)
            runc = run[:, None]
            # ONE merged leapfrog for the whole fleet; frozen chains recompute
            # from their (finite) frozen state and the result is masked out.
            qn, pn, gn, logpn = leapfrog(q, p, g, v)
            q = jnp.where(runc, qn, q)
            p = jnp.where(runc, pn, p)
            g = jnp.where(runc, gn, g)
            logw = logpn - 0.5 * rowdot(pn, pn) - H0      # (C,)
            diverged = diverged | (
                run & ((logw < -config.max_delta_energy) | ~jnp.isfinite(logw))
            )
            new_lsw = jnp.where(run, jnp.logaddexp(log_sub_w, logw), log_sub_w)
            take = run & (
                jnp.log(jax.random.uniform(ku, (C,), q.dtype))
                < logw - new_lsw
            )
            prop = jnp.where(take[:, None], q, prop)
            sa = sa + jnp.where(run, jnp.minimum(1.0, jnp.exp(logw)), 0.0)
            n_done = n_done + run.astype(jnp.int32)
            # boundary stack: store even nodes (running chains' rows only),
            # check the blocks ending at odd i
            is_even = (i % 2) == 0
            slot = jnp.where(i == 0, depth, _ctz(jnp.maximum(i, 1)))
            row_q = jnp.where(runc, q, sq[slot])
            row_p = jnp.where(runc, p, sp[slot])
            sq = jnp.where(is_even, sq.at[slot].set(row_q), sq)
            sp = jnp.where(is_even, sp.at[slot].set(row_p), sp)

            def check_block(b, turning):
                start = i + 1 - (jnp.int32(1) << b)
                live = (~is_even) & (b <= _ctz(i + 1)) & (b >= 1)
                slot_b = jnp.where(start == 0, depth,
                                   _ctz(jnp.maximum(start, 1)))
                q_a = sq[slot_b]                          # (C, dim)
                p_a = sp[slot_b]
                dq = v[:, None] * (q - q_a)
                turn_b = (rowdot(dq, p_a) < 0) | (rowdot(dq, p) < 0)
                return turning | (live & run & turn_b)

            turning = jax.lax.fori_loop(1, md + 1, check_block, turning)
            return (i + 1, key, q, p, g, prop, new_lsw, sa, turning,
                    diverged, sq, sp, n_done)

        neg_inf = jnp.full((C,), -jnp.inf, q_s.dtype)
        init = (jnp.int32(0), key, q_s, p_s, g_s, q_s, neg_inf,
                jnp.zeros((C,), q_s.dtype), jnp.zeros((C,), bool),
                jnp.zeros((C,), bool), stack_q, stack_p,
                jnp.zeros((C,), jnp.int32))
        (_, _, q, p, g, prop, log_sub_w, sum_alpha, turning, diverged,
         _, _, n_done) = jax.lax.while_loop(cond, body, init)
        return (q, p, g), prop, log_sub_w, turning, diverged, sum_alpha, n_done

    def outer_cond(t: _TreeFleet):
        return (t.depth < md) & jnp.any(~t.turning & ~t.diverged)

    def outer_body(t: _TreeFleet) -> _TreeFleet:
        key, kv, kacc, ksub = jax.random.split(t.key, 4)
        active = ~t.turning & ~t.diverged                 # (C,)
        v = jnp.where(jax.random.bernoulli(kv, shape=(C,)), 1.0, -1.0).astype(
            q0.dtype
        )
        fwd = (v > 0)[:, None]
        z_start = (
            jnp.where(fwd, t.q_right, t.q_left),
            jnp.where(fwd, t.p_right, t.p_left),
            jnp.where(fwd, t.g_right, t.g_left),
        )
        (z_end, prop, log_sub_w, sub_turn, sub_div, sum_alpha, n_sub) = (
            build_subtree(ksub, t.depth, z_start, v, active)
        )
        q_e, p_e, g_e = z_end
        bad = sub_turn | sub_div
        keep = active & ~bad
        take = keep & (
            jnp.log(jax.random.uniform(kacc, (C,), q0.dtype))
            < log_sub_w - t.log_w
        )
        q_prop = jnp.where(take[:, None], prop, t.q_prop)
        log_w = jnp.where(keep, jnp.logaddexp(t.log_w, log_sub_w), t.log_w)
        upd_l = (keep & (v < 0))[:, None]
        upd_r = (keep & (v > 0))[:, None]
        q_left = jnp.where(upd_l, q_e, t.q_left)
        p_left = jnp.where(upd_l, p_e, t.p_left)
        g_left = jnp.where(upd_l, g_e, t.g_left)
        q_right = jnp.where(upd_r, q_e, t.q_right)
        p_right = jnp.where(upd_r, p_e, t.p_right)
        g_right = jnp.where(upd_r, g_e, t.g_right)
        dq = q_right - q_left
        glob_turn = (rowdot(dq, p_left) < 0) | (rowdot(dq, p_right) < 0)
        return _TreeFleet(
            key=key,
            depth=t.depth + 1,
            q_left=q_left, p_left=p_left, g_left=g_left,
            q_right=q_right, p_right=p_right, g_right=g_right,
            q_prop=q_prop,
            log_w=log_w,
            turning=t.turning | (active & sub_turn) | (keep & glob_turn),
            diverged=t.diverged | (active & sub_div),
            sum_alpha=t.sum_alpha + sum_alpha,   # masked inside the subtree
            n_alpha=t.n_alpha + n_sub.astype(jnp.float32),
            n_leapfrog=t.n_leapfrog + n_sub,
        )

    t0 = _TreeFleet(
        key=kloop,
        depth=jnp.int32(0),
        q_left=q0, p_left=p0, g_left=g0,
        q_right=q0, p_right=p0, g_right=g0,
        q_prop=q0,
        log_w=jnp.zeros((C,), q0.dtype),
        turning=jnp.zeros((C,), bool),
        diverged=jnp.zeros((C,), bool),
        sum_alpha=jnp.zeros((C,), q0.dtype),
        n_alpha=jnp.zeros((C,), jnp.float32),
        n_leapfrog=jnp.zeros((C,), jnp.int32),
    )
    t = jax.lax.while_loop(outer_cond, outer_body, t0)
    logp_new, g_new = logp_and_grad(t.q_prop)
    accept_stat = t.sum_alpha / jnp.maximum(t.n_alpha, 1.0)
    return t.q_prop, logp_new, g_new, accept_stat, t.n_leapfrog, t.diverged


def run_nuts(
    log_prob_fn: Callable[[Any], jnp.ndarray],
    position0: Any,
    key: jax.Array,
    *,
    num_warmup: int,
    num_samples: int,
    config: NUTSConfig = NUTSConfig(),
    collect_fn: Callable | None = None,
):
    """Run one NUTS chain. Returns
    ``(samples, stats, final_step_size)`` where ``stats`` is a dict of
    per-draw arrays: ``accept_stat``, ``n_leapfrog``, ``diverged``.

    Warmup adapts the step size by dual averaging toward
    ``config.target_accept`` (identity mass matrix — matching the rstan
    reports the reference logs, which run Stan's defaults on standardised
    data); sampling runs at the averaged step size. vmap over chains as
    usual.
    """
    if collect_fn is None:
        collect_fn = lambda q: q
    q0_flat, unravel = ravel_pytree(position0)
    dtype = q0_flat.dtype

    def logp_and_grad(q):
        val, g = jax.value_and_grad(lambda x: log_prob_fn(unravel(x)))(q)
        return val, g

    logp0, g0 = logp_and_grad(q0_flat)

    def transition(carry, adapt):
        (q, logp, g, key, log_eps, log_eps_bar, h_bar, it) = carry
        key, kt = jax.random.split(key)
        step_size = jnp.exp(jnp.where(adapt, log_eps, log_eps_bar))
        q, logp, g, accept_stat, n_lf, div = _nuts_transition(
            logp_and_grad, q, logp, g, kt, step_size, config
        )
        # dual averaging
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
        return (q, logp, g, key, log_eps, log_eps_bar, h_bar, it), (
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
