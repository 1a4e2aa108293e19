"""Chain/data sharding of the SGLD family (L4).

Replaces the reference's two parallel constructs with mesh collectives:

- ``@parallel`` seed sweeps (independent chains;
  ``SynthDataExperiment.jl:44``, ``kin40kExperiment.jl:67``) → chains vmapped
  per device and sharded over the mesh ``chain`` axis;
- ``@sync @parallel`` SharedArray inner loops + the ``@parallel (+)``
  prediction reduction (``GPT_SGLD_p.jl:70-132``) → minibatch likelihood
  gradients ``psum``-reduced over the mesh ``data`` axis, and cross-chain
  posterior statistics ``pmean``-reduced over the ``chain`` axis.

The multichip training step keeps parameters replicated across the data axis
(they are updated identically on every data shard because the gradient is
psum'd before the update — same determinism argument as the reference's
fork-join barriers, without the fork-join).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from gpt_tpu.inference.sgld import SGLDConfig, SGLDState, make_sgld_step, sgld_init
from gpt_tpu.parallel.mesh import CHAIN_AXIS, DATA_AXIS


def make_multichip_sgld_step(
    model,
    mesh,
    config: SGLDConfig,
    data_size: int,
    jit: bool = True,
) -> Callable:
    """Build a jitted multi-chip SGLD step over a ``(chain, data)`` mesh.

    Returns ``step(states, phi_b, y_b, wts_b) -> states`` where ``states`` is
    a chain-stacked ``SGLDState`` (leading axis = global chain count, sharded
    over the chain axis) and ``(phi_b, y_b, wts_b)`` is one global minibatch
    (leading axis sharded over the data axis, shared by all chains).
    """

    def local_grad_fn(params, batch):
        """Per-device gradient of the *global* scaled log-joint.

        The likelihood sum and the batch weight live across the data axis, so
        both are psum'd; the prior is replicated, added once.
        """
        phi, y, wts = batch

        def scaled_local_ll(p):
            return model.log_lik(p, phi, y, weight=wts)

        g_local = jax.grad(scaled_local_ll)(params)
        g_global = jax.tree.map(lambda a: jax.lax.psum(a, DATA_AXIS), g_local)
        total_w = jax.lax.psum(jnp.sum(wts), DATA_AXIS)
        scale = data_size / jnp.maximum(total_w, 1.0)
        g_prior = jax.grad(lambda p: model.log_prior(p))(params)
        return jax.tree.map(lambda a, b: scale * a + b, g_global, g_prior)

    inner_step = make_sgld_step(
        local_grad_fn, model.manifolds, config,
        event_ndims=getattr(model, "event_ndims", None),
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(CHAIN_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(CHAIN_AXIS),
        check_vma=False,
    )
    def sharded_step(states, phi_b, y_b, wts_b):
        # states: local chain block; batch: local data shard (same for all
        # local chains). vmap the kernel over local chains.
        return jax.vmap(lambda st: inner_step(st, (phi_b, y_b, wts_b)))(states)

    if jit:
        return jax.jit(sharded_step)
    return sharded_step


def init_chain_states(model, key: jax.Array, num_chains: int, config: SGLDConfig) -> SGLDState:
    """Chain-stacked initial sampler states with independent keys/params."""
    kp, ks = jax.random.split(key)
    params = jax.vmap(model.init_params)(jax.random.split(kp, num_chains))
    keys = jax.random.split(ks, num_chains)
    return jax.vmap(lambda p, k: sgld_init(p, k, config))(params, keys)


def run_sharded_chains(
    model,
    mesh,
    key: jax.Array,
    phi: jnp.ndarray,
    y: jnp.ndarray,
    *,
    num_chains: int,
    m: int,
    config: SGLDConfig,
    burnin: int,
    maxepoch: int,
    collect_fn: Callable | None = None,
    adapt_sync: str = "step",
):
    """Full sharded training run: scan over epochs/batches on a mesh.

    Equivalent to :func:`gpt_tpu.inference.run_sgld_chains` but with chains
    laid out over the mesh chain axis and each minibatch sharded over the data
    axis. The whole run — epoch permutation, batch sweep, sharded step,
    thinned collection — is ONE jitted ``lax.scan`` whose body contains the
    ``shard_map`` step, so per-step host dispatch never happens.
    Returns ``(final_states, collected)``; ``collected`` has shape
    ``(chains, maxepoch, ...)`` thinned to post-burnin epoch ends.

    ``adapt_sync`` (adapt_eps only) picks where the fleet-min η coupling is
    all-reduced over the chain axis: ``"step"`` (every minibatch — the exact
    single-host semantics; free on ICI, but a per-step small-message
    all-reduce is LATENCY-bound over DCN at multi-host scale) or ``"epoch"``
    (once per epoch — a chain that rejects still backs ITSELF off
    immediately via its local η; only the fleet-wide coupling lags ≤1 epoch;
    the per-step chain-axis collective disappears — see
    SCALING_devices.md's DCN cost model).
    """
    if adapt_sync not in ("step", "epoch"):
        raise ValueError(f"adapt_sync must be 'step' or 'epoch', got {adapt_sync!r}")
    from jax.sharding import NamedSharding

    N = y.shape[0]
    B = -(-N // m)
    pad = B * m - N
    phi_pad = jnp.concatenate([phi, jnp.zeros_like(phi[:1])], axis=0)
    y_pad = jnp.concatenate([y, jnp.zeros_like(y[:1])], axis=0)
    wts_all = jnp.concatenate(
        [jnp.ones((N,), y.dtype), jnp.zeros((pad,), y.dtype)]
    )

    if collect_fn is None:
        collect_fn = lambda p: p

    step = make_multichip_sgld_step(model, mesh, config, N, jit=False)
    states = init_chain_states(model, key, num_chains, config)
    states = states._replace(
        params=jax.tree.map(lambda a: a.astype(y.dtype), states.params)
    )
    states = jax.device_put(states, NamedSharding(mesh, P(CHAIN_AXIS)))
    kperm = jax.random.fold_in(key, 0x5EED)

    def epoch_body(st, ke):
        perm = jax.random.permutation(ke, N)
        # pads live in the last batch with weight 0 (as the reference's ragged
        # final batch does)
        idx = jnp.concatenate([perm, jnp.full((pad,), N, perm.dtype)]).reshape(B, m)
        wts = wts_all.reshape(B, m)

        def fleet_min_sync(s):
            # fleet coupling: the most conservative chain's step scale wins
            # everywhere (an all-reduce over the mesh chain axis under jit)
            # — one diverging chain backs the whole fleet off, matching the
            # globally-agreed rejection style of the TP path.
            return s._replace(
                eta=jnp.broadcast_to(jnp.min(s.eta), s.eta.shape),
                stable=jnp.broadcast_to(jnp.min(s.stable), s.stable.shape),
            )

        def batch_body(s, b):
            s = step(s, phi_pad[idx[b]], y_pad[idx[b]], wts[b])
            if config.adapt_eps and adapt_sync == "step":
                s = fleet_min_sync(s)
            return s, None

        st, _ = jax.lax.scan(batch_body, st, jnp.arange(B))
        if config.adapt_eps and adapt_sync == "epoch":
            st = fleet_min_sync(st)
        return st, jax.vmap(collect_fn)(st.params)

    @jax.jit
    def run(states, keys):
        return jax.lax.scan(epoch_body, states, keys)

    keys = jax.vmap(lambda e: jax.random.fold_in(kperm, e))(
        jnp.arange(burnin + maxepoch)
    )
    states, collected = run(states, keys)
    collected = jax.tree.map(
        lambda a: jnp.swapaxes(a[burnin:], 0, 1), collected
    )
    return states, collected


def cross_chain_moments(samples, mesh=None):
    """Posterior mean/variance across the chain axis (axis 0).

    The collective analog of the reference's ``@parallel (+)`` posterior-mean
    reduction (``GPT_SGLD_p.jl:124-132``): under jit on a mesh, XLA lowers
    these reductions to ``all-reduce`` over ICI/DCN.
    """
    mean = jax.tree.map(lambda a: jnp.mean(a, axis=0), samples)
    var = jax.tree.map(lambda a: jnp.var(a, axis=0), samples)
    return mean, var


def run_sgld_megafused_sharded(
    model,
    mesh,
    key: jax.Array,
    phi: jnp.ndarray,
    y: jnp.ndarray,
    *,
    num_chains: int,
    m: int,
    config: SGLDConfig,
    burnin: int,
    maxepoch: int,
    collect_fn: Callable | None = None,
    chain_block: int = 16,
    data_chunk: int = 50,
):
    """Megafused Pallas fleet sharded over the mesh ``chain`` axis.

    Each device advances its ``num_chains / n_dev`` chain shard with
    :func:`gpt_tpu.inference.sgld.run_sgld_megafused`'s fully-fused
    transition kernel (one ``pallas_call`` per step); chains are independent,
    so the only collective is the ``psum`` of the rejection counter. This is
    the multi-chip scaling path for the single-chip speed-of-light runner —
    the reference's ``@parallel`` seed sweep (``GPT_SGLD_p.jl:146-243``) at
    fleet scale: (chips) x (chain blocks per chip) x (chains per block).

    ``params0`` is drawn inside (``num_chains`` i.i.d. inits); per-device
    noise/permutation keys are ``fold_in(key, device_index)``, so a sharded
    run equals the concatenation of the per-shard single-device runs with
    those keys (tested exactly with ``langevin=False``).
    Returns ``(final_params, collected, rejected_total)`` with global
    (chain-stacked) leading axes.
    """
    from gpt_tpu.inference.sgld import _collect_params, run_sgld_megafused

    ndev = mesh.shape[CHAIN_AXIS]
    if num_chains % ndev:
        raise ValueError(f"{num_chains} chains not divisible over {ndev} devices")
    if collect_fn is None:
        collect_fn = _collect_params
    kinit, krun = jax.random.split(key)
    params0 = jax.vmap(model.init_params)(jax.random.split(kinit, num_chains))
    params0 = jax.tree.map(lambda a: a.astype(jnp.float32), params0)
    keys = jax.vmap(lambda i: jax.random.fold_in(krun, i))(jnp.arange(ndev))

    def shard_body(params_local, keys_local, phi_r, y_r):
        final, collected, rej = run_sgld_megafused(
            model, params_local, keys_local[0], phi_r, y_r, m=m,
            config=config, burnin=burnin, maxepoch=maxepoch,
            collect_fn=collect_fn, chain_block=chain_block,
            data_chunk=data_chunk,
        )
        return final, collected, jax.lax.psum(rej, CHAIN_AXIS)

    sharded = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(CHAIN_AXIS), P(CHAIN_AXIS), P(), P()),
        out_specs=(P(CHAIN_AXIS), P(None, CHAIN_AXIS), P()),
        check_vma=False,
    )
    return jax.jit(sharded)(params0, keys, phi, y)
