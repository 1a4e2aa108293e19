"""Tensor parallelism: feature-axis sharding of full-theta SGLD (L4).

The reference's no-tensor experiments scale the RFF dimension to n = 8000
with a note that n = 16000 is the intended target
(``kin40kNoTensorExperiment.jl:34-46``) — at that size θ (n,) and φ (N, n)
are the model state, and the natural TPU sharding is the *feature* axis:
each device holds a column block ``φ[:, shard]`` and the matching slice
``θ[shard]``.

Per SGLD step the only cross-shard quantity is the scalar-per-datum forward
``fhat = φ_b θ = Σ_shards φ_b[:, s] θ[s]`` — ONE m-length psum over ICI.
Everything else (the likelihood gradient ``φ_bᵀ residual``, the prior
gradient, the Langevin noise, the update) is purely local to the shard. This
is the TP analog of Megatron column parallelism for a linear model: shard the
contraction axis, all-reduce the activation.

Design notes (TPU-first):

- the whole training run — epoch permutation, minibatch sweep, psum'd
  forward, local update, thinned collection — is ONE ``shard_map`` whose body
  is a ``lax.scan``; a single XLA program per run, collectives riding ICI.
- per-shard Langevin noise keys are decorrelated by folding the feature-axis
  index into the noise key; the permutation key is NOT folded, so every shard
  sweeps the same minibatch sequence (they must — they share each datum).
- the NaN rejection (reference contract ``GPT_SGLD.jl:840-843``) is
  all-reduced over the feature axis so all shards agree on whether a step is
  committed: a shard-local divergence must roll back the *global* θ step.
- θ is initialised by drawing the full (padded) vector on every shard from
  the same key and slicing the local block — init is therefore independent of
  the mesh size, which is what makes sharded-vs-unsharded equivalence exact.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from gpt_tpu.inference.sgld import SGLDConfig, _pad_data, _epoch_batches
from gpt_tpu.parallel.mesh import CHAIN_AXIS, FEATURE_AXIS


def _scalar_eps(config: SGLDConfig) -> float:
    eps = config.eps
    if hasattr(eps, "theta"):
        eps = eps.theta
    # accept python scalars AND 0-d arrays (jnp.isscalar is False for the
    # latter); anything float() can't convert is a genuine type error
    if not isinstance(eps, (int, float)) and jnp.ndim(eps) != 0:
        raise TypeError("TP full-theta SGLD needs a scalar eps (or params-prefix with .theta)")
    return float(eps)


def run_sgld_tp(
    model,
    mesh,
    key: jax.Array,
    phi: jnp.ndarray,
    y: jnp.ndarray,
    *,
    m: int,
    config: SGLDConfig,
    burnin: int,
    maxepoch: int,
):
    """Feature-sharded full-theta SGLD over a ``(feature,)`` mesh.

    Same sampler semantics as ``run_sgld`` on :class:`FullThetaGP`
    (``GPNT_SGLD``, ``GPT_SGLD.jl:806-847``): per epoch shuffle, sweep
    minibatches of size ``m``, SGLD update with decay ``ε·t^{−decay}``, reject
    non-finite steps. θ and φ's feature axis are sharded over the mesh; the
    per-step forward is psum'd.

    Returns ``(theta_final (n,), collected (maxepoch, n), rejected)`` with
    collection thinned to post-burnin epoch ends. Outputs keep their feature
    sharding (device-resident); index/transfer as needed.
    """
    n = phi.shape[1]
    shards = mesh.shape[FEATURE_AXIS]
    n_pad = -(-n // shards) * shards
    if n_pad != n:
        # zero feature columns: padded θ coords never touch fhat; under the
        # prior+noise they random-walk harmlessly and are sliced off below.
        phi = jnp.pad(phi, ((0, 0), (0, n_pad - n)))

    N = y.shape[0]
    B, pad = _pad_data(N, m)
    phi_data_pad = jnp.concatenate([phi, jnp.zeros_like(phi[:1])], axis=0)
    y_pad = jnp.concatenate([y, jnp.zeros_like(y[:1])])

    eps0 = _scalar_eps(config)
    decay = float(config.decay)
    langevin = bool(config.langevin)
    sig2 = float(model.signal_var)
    st2 = float(model.sigma_theta) ** 2
    epochs = burnin + maxepoch

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, FEATURE_AXIS), P()),
        out_specs=(P(FEATURE_AXIS), P(None, FEATURE_AXIS), P()),
        check_vma=False,
    )
    def run(key, phi_local, y_all):
        ax = jax.lax.axis_index(FEATURE_AXIS)
        n_local = phi_local.shape[1]
        kinit, kperm, knoise = jax.random.split(key, 3)
        knoise = jax.random.fold_in(knoise, ax)
        theta_full0 = model.sigma_theta * jax.random.normal(
            kinit, (n_pad,), phi_local.dtype
        )
        theta0 = jax.lax.dynamic_slice(theta_full0, (ax * n_local,), (n_local,))

        def batch_body(carry, b_idx):
            theta, G, kn, t, rej = carry
            idx, wts = b_idx
            kn, sub = jax.random.split(kn)
            phi_b = phi_local[idx]  # (m, n_local)
            resid_scale = N / jnp.maximum(jnp.sum(wts), 1.0)
            fhat = jax.lax.psum(phi_b @ theta, FEATURE_AXIS)
            resid = wts * (y_all[idx] - fhat) / sig2
            g = resid_scale * (phi_b.T @ resid) - theta / st2
            tf = t.astype(phi_b.dtype) + 1.0
            e_t = eps0 * tf ** (-decay) if decay else jnp.asarray(eps0, phi_b.dtype)
            if config.rmsprop:
                # per-coordinate preconditioner is shard-local (θ is
                # feature-sharded, G shards with it) — no extra collectives
                G = config.rmsprop_alpha * G + (1 - config.rmsprop_alpha) * g * g
                scale = 1.0 / (config.rmsprop_lambda + jnp.sqrt(G))
                drift = e_t * scale * g / 2
                noise_scale = jnp.sqrt(e_t * scale)
            else:
                drift = e_t * g / 2
                noise_scale = jnp.sqrt(e_t)
            newt = theta + drift
            if langevin:
                newt = newt + noise_scale * jax.random.normal(
                    sub, theta.shape, theta.dtype
                )
            bad_local = (~jnp.all(jnp.isfinite(newt))).astype(jnp.int32)
            bad = jax.lax.psum(bad_local, FEATURE_AXIS) > 0
            theta = jnp.where(bad, theta, newt)
            return (theta, G, kn, t + 1, rej + bad.astype(jnp.int32)), None

        def epoch_body(carry, e):
            kp = jax.random.fold_in(kperm, e)
            idx, wts = _epoch_batches(kp, N, B, m, pad)
            carry, _ = jax.lax.scan(batch_body, carry, (idx, wts))
            return carry, carry[0]

        carry0 = (theta0, jnp.zeros_like(theta0), knoise,
                  jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        (theta, _, _, _, rej), collected = jax.lax.scan(
            epoch_body, carry0, jnp.arange(epochs)
        )
        return theta, collected, rej

    theta, collected, rejected = jax.jit(run)(key, phi_data_pad, y_pad)
    return theta[:n], collected[burnin:, :n], rejected


def run_sgld_tp_chains(
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
):
    """TP x chain composition: many full-theta chains, each feature-sharded,
    over a ``(chain, feature)`` mesh.

    The reference's biggest no-tensor runs pair large n (8000-16000,
    ``kin40kNoTensorExperiment.jl:34-46``) with seed sweeps — this runner is
    both at once: the chain axis carries independent chains (the seed sweep),
    the feature axis splits theta/phi columns inside each chain with one
    m-length psum per step (Megatron-style column parallelism for the linear
    model).

    Layout invariance: per-chain keys fold the GLOBAL chain id and per-step
    noise is drawn as the full (padded) theta vector then sliced locally, so
    results are independent of the mesh factorisation — (1, 1) == (2, 4) to
    collective-reduction-order tolerance (tested). RMSprop is supported
    (shard-local preconditioner).

    Returns ``(theta (C, n), collected (C, maxepoch, n), rejected (C,))``.
    """
    n = phi.shape[1]
    shards = mesh.shape[FEATURE_AXIS]
    chain_groups = mesh.shape[CHAIN_AXIS]
    if num_chains % chain_groups:
        raise ValueError(f"{num_chains} chains do not split over {chain_groups} groups")
    n_pad = -(-n // shards) * shards
    if n_pad != n:
        phi = jnp.pad(phi, ((0, 0), (0, n_pad - n)))

    N = y.shape[0]
    B, pad = _pad_data(N, m)
    phi_data_pad = jnp.concatenate([phi, jnp.zeros_like(phi[:1])], axis=0)
    y_pad = jnp.concatenate([y, jnp.zeros_like(y[:1])])

    eps0 = _scalar_eps(config)
    decay = float(config.decay)
    langevin = bool(config.langevin)
    sig2 = float(model.signal_var)
    st2 = float(model.sigma_theta) ** 2
    epochs = burnin + maxepoch
    chain_keys = jax.vmap(lambda c: jax.random.fold_in(key, c))(
        jnp.arange(num_chains)
    )
    kperm_base = jax.random.fold_in(key, 0x9E77)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(CHAIN_AXIS), P(None, FEATURE_AXIS), P()),
        out_specs=(P(CHAIN_AXIS, FEATURE_AXIS), P(CHAIN_AXIS, None, FEATURE_AXIS),
                   P(CHAIN_AXIS)),
        check_vma=False,
    )
    def run(keys_local, phi_local, y_all):
        ax = jax.lax.axis_index(FEATURE_AXIS)
        n_local = phi_local.shape[1]

        def one_chain(ck):
            kinit, knoise = jax.random.split(ck)
            theta_full0 = model.sigma_theta * jax.random.normal(
                kinit, (n_pad,), phi_local.dtype
            )
            theta0 = jax.lax.dynamic_slice(theta_full0, (ax * n_local,), (n_local,))

            def batch_body(carry, b_idx):
                theta, G, t, rej = carry
                idx, wts = b_idx
                sub = jax.random.fold_in(knoise, t)
                phi_b = phi_local[idx]
                resid_scale = N / jnp.maximum(jnp.sum(wts), 1.0)
                fhat = jax.lax.psum(phi_b @ theta, FEATURE_AXIS)
                resid = wts * (y_all[idx] - fhat) / sig2
                g = resid_scale * (phi_b.T @ resid) - theta / st2
                tf = t.astype(phi_b.dtype) + 1.0
                e_t = eps0 * tf ** (-decay) if decay else jnp.asarray(eps0, phi_b.dtype)
                if config.rmsprop:
                    G = config.rmsprop_alpha * G + (1 - config.rmsprop_alpha) * g * g
                    scale = 1.0 / (config.rmsprop_lambda + jnp.sqrt(G))
                    drift = e_t * scale * g / 2
                    noise_scale = jnp.sqrt(e_t * scale)
                else:
                    drift = e_t * g / 2
                    noise_scale = jnp.sqrt(e_t)
                newt = theta + drift
                if langevin:
                    # layout-independent stream: full-width draw, local slice
                    noise_full = jax.random.normal(sub, (n_pad,), theta.dtype)
                    newt = newt + noise_scale * jax.lax.dynamic_slice(
                        noise_full, (ax * n_local,), (n_local,)
                    )
                bad_local = (~jnp.all(jnp.isfinite(newt))).astype(jnp.int32)
                bad = jax.lax.psum(bad_local, FEATURE_AXIS) > 0
                theta = jnp.where(bad, theta, newt)
                return (theta, G, t + 1, rej + bad.astype(jnp.int32)), None

            def epoch_body(carry, e):
                kp = jax.random.fold_in(kperm_base, e)
                idx, wts = _epoch_batches(kp, N, B, m, pad)
                carry, _ = jax.lax.scan(batch_body, carry, (idx, wts))
                return carry, carry[0]

            carry0 = (theta0, jnp.zeros_like(theta0),
                      jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
            (theta, _, _, rej), collected = jax.lax.scan(
                epoch_body, carry0, jnp.arange(epochs)
            )
            return theta, collected, rej

        return jax.vmap(one_chain)(keys_local)

    theta, collected, rejected = jax.jit(run)(chain_keys, phi_data_pad, y_pad)
    return theta[:, :n], collected[:, burnin:, :n], rejected
