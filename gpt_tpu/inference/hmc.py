"""Adaptive HMC — the in-framework gold-standard posterior engine (L6).

The reference outsources gold-standard posteriors to external engines: CmdStan
NUTS (``StanFullTheta.jl:6-51``, ``california/*.r``, ``temperature_uk/*.r``)
and Mamba NUTS (``ImageExperiment.jl:223-283``). This module replaces that
layer with a self-contained engine: Hamiltonian Monte Carlo with Stan-style
dual-averaging step-size adaptation (Hoffman & Gelman 2014, Algorithm 5) and
jittered step counts, running on arbitrary Euclidean parameter pytrees.
Used together with ``diagnostics.mcmc`` (R̂/ESS) it serves the same role as
the rstan reports at ``california/fullthetamatrix.r:63-64``.

For Stiefel-constrained targets use ``inference.gmc`` (geodesic MC); this
module is the Euclidean (full-theta / tensor2d / matrix-theta) gold standard.

Everything (warmup + sampling) is one ``lax.scan`` — chains vmap/shard as
usual.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class HMCConfig:
    num_leapfrog: int = 16
    target_accept: float = 0.8
    init_step_size: float = 0.1
    jitter_steps: bool = True  # sample L ~ U[1, num_leapfrog] per iteration
    # dual-averaging constants (Stan defaults)
    gamma: float = 0.05
    t0: float = 10.0
    kappa: float = 0.75


class HMCState(NamedTuple):
    position: Any
    key: jax.Array
    step_size: jnp.ndarray
    # dual-averaging state
    log_eps_bar: jnp.ndarray
    h_bar: jnp.ndarray
    iter: jnp.ndarray


def _kinetic(p):
    return sum(jnp.sum(x**2) / 2 for x in jax.tree.leaves(p))


def run_adaptive_hmc(
    log_prob_fn: Callable[[Any], jnp.ndarray],
    position0: Any,
    key: jax.Array,
    *,
    num_warmup: int,
    num_samples: int,
    config: HMCConfig = HMCConfig(),
    collect_fn: Callable | None = None,
):
    """Returns (samples, accept_probs, final_step_size).

    Warmup adapts ε by dual averaging toward ``target_accept``; sampling uses
    the averaged ε̄. ``samples`` are the ``num_samples`` post-warmup draws
    (``collect_fn`` applied, default identity).
    """
    if collect_fn is None:
        collect_fn = lambda q: q
    grad_fn = jax.grad(log_prob_fn)

    def transition(state: HMCState, adapt: bool):
        key, kmom, kacc, ksteps = jax.random.split(state.key, 4)
        momentum = jax.tree.map(
            lambda x, k: jax.random.normal(k, x.shape, x.dtype),
            state.position,
            jax.tree.unflatten(
                jax.tree.structure(state.position),
                list(jax.random.split(kmom, len(jax.tree.leaves(state.position)))),
            ),
        )
        H0 = log_prob_fn(state.position) - _kinetic(momentum)
        if config.jitter_steps:
            L = jax.random.randint(ksteps, (), 1, config.num_leapfrog + 1)
        else:
            L = config.num_leapfrog
        # fixed-length scan with masked extra steps would recompile per L;
        # instead scan max steps and keep the L-th state. The endpoint
        # gradient is carried so adjacent half-kicks share one evaluation
        # (L+1 gradient evals instead of 2L — the dominant per-epoch cost).
        def body(carry, i):
            q, p, g = carry
            p_half = jax.tree.map(lambda pp, gg: pp + 0.5 * state.step_size * gg, p, g)
            q_new = jax.tree.map(lambda qq, pp: qq + state.step_size * pp, q, p_half)
            g_new = grad_fn(q_new)
            p_new = jax.tree.map(lambda pp, gg: pp + 0.5 * state.step_size * gg, p_half, g_new)
            take = i < L
            q = jax.tree.map(lambda a, b: jnp.where(take, b, a), q, q_new)
            p = jax.tree.map(lambda a, b: jnp.where(take, b, a), p, p_new)
            g = jax.tree.map(lambda a, b: jnp.where(take, b, a), g, g_new)
            return (q, p, g), None

        (q_prop, p_prop, _), _ = jax.lax.scan(
            body, (state.position, momentum, grad_fn(state.position)),
            jnp.arange(config.num_leapfrog),
        )
        H1 = log_prob_fn(q_prop) - _kinetic(p_prop)
        log_ratio = jnp.where(jnp.isfinite(H1), H1 - H0, -jnp.inf)
        accept_prob = jnp.exp(jnp.minimum(log_ratio, 0.0))
        accept = jax.random.uniform(kacc, ()) < accept_prob
        new_pos = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), q_prop, state.position
        )

        # dual averaging (only during warmup); all f32 to keep carry stable
        it = state.iter + 1
        it_f = it.astype(jnp.float32)
        mu = jnp.float32(jnp.log(10.0 * config.init_step_size))
        eta = jnp.float32(1.0) / (it_f + jnp.float32(config.t0))
        h_bar = (1 - eta) * state.h_bar + eta * (
            jnp.float32(config.target_accept) - accept_prob.astype(jnp.float32)
        )
        log_eps = mu - jnp.sqrt(it_f) / jnp.float32(config.gamma) * h_bar
        pow_ = it_f ** jnp.float32(-config.kappa)
        log_eps_bar = pow_ * log_eps + (1 - pow_) * state.log_eps_bar
        if adapt:
            step_size = jnp.exp(log_eps)
        else:
            step_size = state.step_size
        return HMCState(
            position=new_pos,
            key=key,
            step_size=step_size,
            log_eps_bar=log_eps_bar,
            h_bar=h_bar,
            iter=it,
        ), accept_prob

    state0 = HMCState(
        position=position0,
        key=key,
        step_size=jnp.asarray(config.init_step_size, jnp.float32),
        log_eps_bar=jnp.log(jnp.asarray(config.init_step_size, jnp.float32)),
        h_bar=jnp.zeros((), jnp.float32),
        iter=jnp.zeros((), jnp.int32),
    )

    def warm_body(st, _):
        st, acc = transition(st, adapt=True)
        return st, acc

    state, warm_acc = jax.lax.scan(warm_body, state0, None, length=num_warmup)
    state = state._replace(step_size=jnp.exp(state.log_eps_bar))

    def sample_body(st, _):
        st, acc = transition(st, adapt=False)
        return st, (collect_fn(st.position), acc)

    state, (samples, accs) = jax.lax.scan(sample_body, state, None, length=num_samples)
    return samples, accs, state.step_size
