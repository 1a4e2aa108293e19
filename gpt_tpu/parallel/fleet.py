"""Sharded chain fleets for the non-SGLD samplers (L4).

The reference ran Gibbs and GMC workloads as ``@parallel`` seed sweeps just
like SGLD (``100k_movielensExperiment.jl:733`` fold-parallel Gibbs,
``kin40kExperiment.jl:67``); the TPU-native form is identical for every
sampler: vmap chains within a device, shard the chain axis over the mesh.
These wrappers give Gibbs / columnwise-Gibbs / CF-Gibbs / GMC the same
multi-device story ``run_sharded_chains`` gives SGLD.

Chains are fully independent here (full-batch conjugate sweeps / full-batch
Hamiltonians — no data axis), so the only collective is the implicit
all-gather when results are pulled; cross-chain statistics go through
``cross_chain_moments`` as usual.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from gpt_tpu.parallel.mesh import CHAIN_AXIS


def run_chain_fleet(mesh, run_one: Callable, params0_chains, keys):
    """Shard a vmapped single-chain runner over the mesh chain axis.

    ``run_one(params, key) -> pytree`` is any single-chain sampler run;
    ``params0_chains``/``keys`` carry a leading chain axis that is laid out
    over ``mesh``'s chain axis (other mesh axes, if any, hold replicas).
    """

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(CHAIN_AXIS), P(CHAIN_AXIS)),
        out_specs=P(CHAIN_AXIS),
        check_vma=False,
    )
    def fleet(p, k):
        return jax.vmap(run_one)(p, k)

    return fleet(params0_chains, keys)


def run_gibbs_fleet(
    model,
    mesh,
    key: jax.Array,
    phi: jnp.ndarray,
    y: jnp.ndarray,
    *,
    num_chains: int,
    num_iterations: int,
    burnin: int,
    config=None,
    columnwise: bool = False,
):
    """Sharded fleet of conjugate Gibbs chains (``TGP.GPT_inf`` sweeps).

    Returns ``(final_params, collected)`` with leading chain axes.
    """
    from gpt_tpu.inference.gibbs import GibbsConfig, init_gibbs_params, run_gibbs

    config = config if config is not None else GibbsConfig()
    kp, ks = jax.random.split(key)
    params0 = jax.vmap(lambda k: init_gibbs_params(model, k, dtype=phi.dtype))(
        jax.random.split(kp, num_chains)
    )
    keys = jax.random.split(ks, num_chains)

    def run_one(p, k):
        return run_gibbs(
            model, p, k, phi, y,
            num_iterations=num_iterations, burnin=burnin, config=config,
            columnwise=columnwise,
        )

    return run_chain_fleet(mesh, run_one, params0, keys)


def run_gmc_fleet(
    model,
    mesh,
    key: jax.Array,
    phi: jnp.ndarray,
    y: jnp.ndarray,
    *,
    num_chains: int,
    config,
    burnin: int,
    maxepoch: int,
    merged: bool = False,
    grad_backend: str = "xla",
):
    """Sharded fleet of geodesic-MC chains (``GPT_GMC`` seed sweeps).

    ``merged=True`` advances each device's chain shard through the
    chain-MERGED runner (:func:`gpt_tpu.inference.gmc.run_gmc_chains` —
    lane-merged gradients/projections, per-chain MH; pair with
    ``TensorGP(contraction="merged")`` and optionally
    ``grad_backend="pallas"`` for the r4 fast path) instead of vmapping
    per-chain programs; PRNG streams differ between the two, so they are
    statistically (not bitwise) equivalent.

    Returns ``(final_params, collected, accept_probs[, eta_bar])`` with
    leading chain axes (``eta_bar`` present iff ``config.adapt_step_size``).
    """
    from gpt_tpu.inference.gmc import run_gmc, run_gmc_chains

    kp, ks = jax.random.split(key)
    params0 = jax.vmap(model.init_params)(jax.random.split(kp, num_chains))
    params0 = jax.tree.map(lambda a: a.astype(phi.dtype), params0)

    if merged:
        ndev = mesh.shape[CHAIN_AXIS]
        if num_chains % ndev:
            raise ValueError(
                f"{num_chains} chains not divisible over {ndev} devices")
        keys = jax.vmap(lambda i: jax.random.fold_in(ks, i))(jnp.arange(ndev))

        @jax.jit
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(CHAIN_AXIS), P(CHAIN_AXIS)),
            out_specs=P(CHAIN_AXIS),
            check_vma=False,
        )
        def fleet(p, k):
            out = run_gmc_chains(
                model, p, k[0], phi, y, config=config, burnin=burnin,
                maxepoch=maxepoch, grad_backend=grad_backend,
            )
            # accept (epochs, C_local) [+ eta (C_local,)] -> chain-leading
            out = list(out)
            out[2] = jnp.swapaxes(out[2], 0, 1)
            # collected is (epochs, C_local, ...) -> (C_local, epochs, ...)
            out[1] = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), out[1])
            return tuple(out)

        return fleet(params0, keys)

    keys = jax.random.split(ks, num_chains)

    def run_one(p, k):
        return run_gmc(
            model, p, k, phi, y, config=config, burnin=burnin,
            maxepoch=maxepoch,
        )

    return run_chain_fleet(mesh, run_one, params0, keys)


def run_manifold_nuts_fleet(
    model,
    mesh,
    key: jax.Array,
    phi: jnp.ndarray,
    y: jnp.ndarray,
    *,
    num_chains: int,
    eps,
    num_warmup: int,
    num_samples: int,
    config=None,
    grad_backend: str = "xla",
):
    """Sharded fleet of chain-MERGED manifold-NUTS chains.

    Completes the fleet family (SGLD/Gibbs/GMC/megafused) for the dynamic-
    trajectory engine: each device's chain shard advances through
    :func:`gpt_tpu.inference.manifold_nuts.run_manifold_nuts_chains` (every
    tree leaf = one merged shard gradient), devices independent — chains
    stay embarrassingly parallel; only diagnostics cross shards afterwards.

    Returns ``(samples, stats, step_size, final_params)`` with chain-leading
    axes: samples leaves ``(num_chains, num_samples, ...)``, stats
    ``(num_chains, num_samples)``, ``step_size (num_chains,)``.
    """
    from gpt_tpu.inference.manifold_nuts import run_manifold_nuts_chains
    from gpt_tpu.inference.nuts import NUTSConfig

    if config is None:
        config = NUTSConfig(init_step_size=1.0)
    ndev = mesh.shape[CHAIN_AXIS]
    if num_chains % ndev:
        raise ValueError(f"{num_chains} chains not divisible over {ndev} devices")
    kp, ks = jax.random.split(key)
    params0 = jax.vmap(model.init_params)(jax.random.split(kp, num_chains))
    params0 = jax.tree.map(lambda a: a.astype(phi.dtype), params0)
    keys = jax.vmap(lambda i: jax.random.fold_in(ks, i))(jnp.arange(ndev))

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(CHAIN_AXIS), P(CHAIN_AXIS)),
        out_specs=P(CHAIN_AXIS),
        check_vma=False,
    )
    def fleet(p, k):
        samples, stats, step, finals = run_manifold_nuts_chains(
            model, p, k[0], phi, y, eps=eps, num_warmup=num_warmup,
            num_samples=num_samples, config=config,
            grad_backend=grad_backend,
        )
        samples = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), samples)
        stats = {k2: jnp.swapaxes(v, 0, 1) for k2, v in stats.items()}
        return samples, stats, step, finals

    return fleet(params0, keys)
