"""SGLD / SGD / Stiefel-geodesic SGLD (SGLDERM) — the main sampler family (L3).

Capability parity with the reference's samplers:

- ``GPTregression``     (``GPT_SGLD.jl:344-448``)  — SGLD on w + SGLDERM on U
- ``GPNT_SGLD``         (``GPT_SGLD.jl:806-847``)  — SGLD on θ with step decay
- ``GPNT_SGLDclass``    (``GPT_SGLD.jl:849-901``)  — softmax classification
- ``GPT_SGLDERMw``      (``GPT_SGLD.jl:1065-1118``) — SGLD on w, U frozen
- ``langevin=False`` flags throughout — plain SGD/gradient ascent
- ``GPT_SGLDERM_RMSprop`` (``GPT_SGLD.jl:1121-1237``) — RMSprop preconditioner

One generic manifold-aware transition kernel replaces them all: the model
supplies ``log_lik``/``log_prior``/``manifolds`` and the kernel applies, per
parameter leaf,

    Euclidean:  x  ← x + ε·∇/2 + √ε·ξ
    Stiefel:    U  ← transport(U, proj_U(√ε·∇/2 + ξ), √ε)

exactly the reference's update laws (``GPT_SGLD.jl:410-439``). ``transport``
is the exact geodesic (parity) or the Cayley retraction (TPU-fast default for
training; both stay on V_{n,r} to machine precision).

TPU-first execution model: an entire training run — epoch shuffling,
minibatching, gradient, manifold transport, thinned sample collection — is ONE
jitted ``lax.scan`` over steps. Chains are vmapped leading axes; nothing here
ever leaves the device. The reference's NaN-abort contract becomes per-step
rejection counting (see ``utils.stiefel.guard``).
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from gpt_tpu.utils import stiefel


@dataclasses.dataclass(frozen=True)
class SGLDConfig:
    """Step sizes + flags for the SGLD family.

    ``eps`` is either a scalar (all leaves) or a pytree-prefix matching the
    params (e.g. ``TensorGPParams(w=1e-4, U=1e-7)`` — the reference's
    ``epsw``/``epsU``). ``decay`` gives ``ε_t = ε·(t+1)^{−decay}``
    (``GPT_SGLD.jl:833``). ``langevin=False`` disables injected noise (SGD
    mode); ``transport`` picks the Stiefel update rule.
    """

    eps: Any
    langevin: bool = True
    transport: str = "geodesic"  # "geodesic" | "cayley" | "polar"
    decay: float = 0.0
    rmsprop: bool = False
    rmsprop_alpha: float = 0.99
    rmsprop_lambda: float = 1e-5
    # Cross-chain step-size adaptation (SURVEY §2.9 "cross-chain moment/
    # step-size adaptation"): a FLEET-SHARED multiplier η on eps that halves
    # whenever any chain rejects a step (NaN / off-manifold divergence) and
    # creeps back up after `adapt_patience` consecutive clean fleet steps,
    # capped at 1 — so a stable run is BITWISE identical to fixed-eps, while
    # a diverging config (e.g. the temperature-Kron ε=1e-6 run that logged
    # 53,994 rejections and ∞ RMSE before hand-retuning) self-recovers.
    adapt_eps: bool = False
    adapt_down: float = 0.5
    adapt_up: float = 1.05
    adapt_patience: int = 50
    # η floor: low enough that a chain wedged at large-but-finite params
    # (where gradients are astronomically scaled) can still take sane steps
    # back toward the posterior basin — 1e-4 deadlocked the temperature-Kron
    # recovery (r4)
    adapt_floor: float = 1e-8
    # adapt_eps trust region (Euclidean leaves). Per-step relative growth
    # cap: reject a step growing a leaf norm past
    # ``adapt_rel_cap·‖old‖ + adapt_rel_slack`` (healthy SGLD moves are
    # ~1e-3 relative, so the 1.05+1.0 default never fires on stable runs —
    # they stay bitwise identical to fixed-eps). Absolute cap: reject any
    # step ending past ``adapt_trust·(init_norm + 1)``. On problems whose
    # posterior mass legitimately sits far from the init scale (non-z-scored
    # data), RAISE adapt_trust (or set it to inf) — otherwise rejections
    # accumulate and the chain can never leave the init ball.
    adapt_rel_cap: float = 1.05
    adapt_rel_slack: float = 1.0
    adapt_trust: float = 100.0


class SGLDState(NamedTuple):
    params: Any
    key: jax.Array
    step: jnp.ndarray  # scalar int32 — global step counter (for decay)
    rejected: jnp.ndarray  # scalar int32 — NaN-rejected transport count
    precond: Any  # RMSprop second-moment accumulator (or None-like zeros)
    # cross-chain adaptation state (fleet-shared; 1.0 / 0 when disabled).
    # Defaults are PYTHON scalars: a jnp default here would create a device
    # array at import time and initialise the XLA backend before
    # jax.distributed.initialize / platform selection can run.
    eta: Any = 1.0  # step-size multiplier on eps
    stable: Any = 0  # consecutive clean fleet steps


def _broadcast_eps(eps, params):
    """Broadcast a scalar or pytree-prefix of step sizes over param leaves.

    ``eps`` may be a scalar (applied to every leaf) or a pytree *prefix* of
    ``params`` whose leaves are scalars — each prefix leaf is expanded over
    the whole corresponding params subtree, so models whose params pytree
    nests containers below the prefix level still map correctly.
    """
    is_scalar = lambda x: isinstance(x, (int, float)) or jnp.isscalar(x)
    if is_scalar(eps):
        return jax.tree.map(lambda _: float(eps), params)

    def expand(e, subtree):
        if not is_scalar(e):
            raise TypeError(
                f"eps pytree leaf {e!r} is not a scalar — eps must be a "
                "scalar or a pytree prefix of params with scalar leaves"
            )
        return jax.tree.map(lambda _: float(e), subtree)

    # jax.tree.map with a prefix as the primary tree passes the matching
    # params *subtree* to ``expand`` wholesale.
    return jax.tree.map(expand, eps, params, is_leaf=is_scalar)


def sgld_init(params, key, config: SGLDConfig) -> SGLDState:
    precond = jax.tree.map(jnp.zeros_like, params) if config.rmsprop else None
    return SGLDState(
        params=params,
        key=key,
        step=jnp.zeros((), jnp.int32),
        rejected=jnp.zeros((), jnp.int32),
        precond=precond,
        eta=jnp.ones((), jnp.float32),
        stable=jnp.zeros((), jnp.int32),
    )


def make_sgld_step(
    grad_fn: Callable,
    manifolds,
    config: SGLDConfig,
    event_ndims=None,
    ref_norms=None,
) -> Callable:
    """Build the jittable transition kernel.

    ``grad_fn(params, batch) -> grads`` must already include the N/m
    minibatch scaling and the prior gradient (see :func:`run_sgld`).
    ``event_ndims`` (pytree matching params, ints) gives the number of
    *trailing* parameter axes per leaf — everything before them is treated as
    independent chain axes for NaN-rejection accounting. ``None`` means the
    whole leaf is one event (single-chain semantics).

    ``ref_norms`` (pytree of per-leaf/per-chain initial norms, adapt_eps
    only) arms the ABSOLUTE trust region: any Euclidean step ending beyond
    100x the initialisation scale is rejected outright. Relative growth caps
    alone cannot stop a divergence cascade — its growth compounds through
    individually-small accepted steps faster than the η backoff can floor
    (measured on the temperature-Kron ε=1e-6 run: the chain wedged at
    ~200x its init scale under 10x, 1.5x and 1.05x per-step caps alike,
    where gradients are so large no η survives). On z-scored problems a
    leaf 100x its init norm is unambiguously diverged.
    Returns ``step(state, batch) -> state``.
    """
    eps_tree = config.eps

    def step(state: SGLDState, batch) -> SGLDState:
        key, sub = jax.random.split(state.key)
        grads = grad_fn(state.params, batch)
        eps = _broadcast_eps(eps_tree, state.params)
        t = state.step.astype(jnp.float32) + 1.0
        decay_factor = t ** (-config.decay) if config.decay else 1.0
        if config.adapt_eps:
            decay_factor = decay_factor * state.eta

        # RMSprop preconditioner (GPT_SGLD.jl:1121-1237): per-element
        # G ← αG + (1−α)g²; step scale 1/(λ+√G). For Stiefel leaves the
        # geodesic needs a scalar time, so the per-matrix mean step is used
        # (GPT_SGLD.jl:1206-1210).
        if config.rmsprop:
            new_precond = jax.tree.map(
                lambda G, g: config.rmsprop_alpha * G
                + (1 - config.rmsprop_alpha) * g * g,
                state.precond,
                grads,
            )
        else:
            new_precond = state.precond

        leaves_p, treedef = jax.tree.flatten(state.params)
        leaves_g = treedef.flatten_up_to(grads)
        leaves_m = treedef.flatten_up_to(manifolds)
        leaves_e = treedef.flatten_up_to(eps)
        leaves_G = treedef.flatten_up_to(new_precond) if config.rmsprop else [None] * len(leaves_p)
        leaves_ed = (
            treedef.flatten_up_to(event_ndims)
            if event_ndims is not None
            else [None] * len(leaves_p)
        )
        leaves_ref = (
            treedef.flatten_up_to(ref_norms)
            if ref_norms is not None
            else [None] * len(leaves_p)
        )
        keys = jax.random.split(sub, len(leaves_p))

        new_leaves = []
        rejected = state.rejected
        for p, g, man, e, G, ed, ref, k in zip(
            leaves_p, leaves_g, leaves_m, leaves_e, leaves_G, leaves_ed,
            leaves_ref, keys
        ):
            if man == "frozen":  # fixed parameters (e.g. GPT_fixw's core w)
                new_leaves.append(p)
                continue
            e = jnp.asarray(e, p.dtype) * decay_factor
            if config.rmsprop and G is not None:
                scale = 1.0 / (config.rmsprop_lambda + jnp.sqrt(G))
            else:
                scale = None
            if man == "stiefel":
                # U is (..., D, n, r): independent transport per factor.
                if scale is not None:
                    # scalar step per factor matrix = mean of elementwise
                    # RMSprop steps — geodesics need a scalar time
                    # (GPT_SGLD.jl:1206-1210).
                    e_mat = e * jnp.mean(scale, axis=(-2, -1))  # (...,)
                else:
                    e_mat = jnp.asarray(e, p.dtype)
                sqe = jnp.sqrt(e_mat)  # scalar or (...,) per-matrix time
                sqe_b = sqe[..., None, None] if sqe.ndim else sqe
                noise = (
                    jax.random.normal(k, p.shape, p.dtype)
                    if config.langevin
                    else jnp.zeros_like(p)
                )
                mom = stiefel.project_tangent(p, sqe_b * g / 2 + noise)
                if config.transport == "polar":
                    # polar retraction IS its own Newton–Schulz projection —
                    # matmuls only, no 2r×2r solve (see stiefel.polar_retract)
                    newU = stiefel.polar_retract(p, mom, sqe)
                else:
                    if config.transport == "cayley":
                        newU = stiefel.cayley_retract(p, mom, sqe)
                    else:
                        newU = stiefel.geodesic(p, mom, sqe)
                    # Newton–Schulz polar correction wipes per-step float
                    # drift (the reference only re-normalises columns,
                    # allowing cross-column drift to accumulate).
                    newU = stiefel.orthonormalize(newU)
                # Reject steps still far off-manifold after correction —
                # that only happens when the gradient blew up (observed
                # ‖UᵀU−I‖ ≈ 3e2 on diverged chains). The reference's only
                # guard is the NaN abort (GPT_SGLD.jl:23-26).
                r_dim = newU.shape[-1]
                UtU = jnp.einsum(
                    "...ni,...nj->...ij", newU, newU,
                    precision=jax.lax.Precision.HIGHEST,
                )
                orth_err = jnp.max(
                    jnp.abs(UtU - jnp.eye(r_dim, dtype=newU.dtype)),
                    axis=(-2, -1),
                )
                bad = ~jnp.isfinite(orth_err) | (orth_err > 1e-2)
                newU = jnp.where(bad[..., None, None], p, newU)
                rej = bad
                rejected = rejected + jnp.sum(rej, dtype=jnp.int32)
                new_leaves.append(newU)
            else:
                drift = e * g / 2 if scale is None else e * scale * g / 2
                if config.langevin:
                    noise_scale = jnp.sqrt(e) if scale is None else jnp.sqrt(e * scale)
                    drift = drift + noise_scale * jax.random.normal(k, p.shape, p.dtype)
                newp = p + drift
                # NaN guard (GPT_SGLD.jl:840-843): one non-finite coordinate
                # means the whole per-chain update came from a corrupted
                # gradient, so reject that chain's entire step — reduce
                # isfinite over the trailing *parameter* axes only, keeping
                # leading chain axes independent (one diverged chain must not
                # freeze the fleet), and count one rejection per diverged
                # chain, matching the Stiefel branch's accounting.
                ev = p.ndim if ed is None else min(int(ed), p.ndim)
                axes = tuple(range(p.ndim - ev, p.ndim))
                bad = ~jnp.all(jnp.isfinite(newp), axis=axes)
                if config.adapt_eps:
                    # Adaptive mode must also reject FINITE-but-absurd steps:
                    # an accepted 1e10-sized first step wedges the chain at a
                    # point whose gradients are all NaN, after which no step
                    # size can recover it (observed on the temperature-Kron
                    # eps=1e-6 run: 405k rejections, identical with and
                    # without backoff, because the wedge happened on an
                    # ACCEPTED step).
                    # Relative cap (adapt_rel_cap·‖old‖ + adapt_rel_slack):
                    # healthy SGLD moves are ~1e-3 relative, so the default
                    # 1.05·‖old‖+1 never fires on stable runs (bitwise
                    # identical to fixed-eps); a divergence cascade exceeds
                    # it within a few steps. Absolute cap (ref = init-scale
                    # norms, adapt_trust multiple): relative caps alone
                    # cannot stop a cascade — its growth compounds through
                    # individually-small accepted steps faster than η can
                    # floor (measured: the temperature-Kron ε=1e-6 chain
                    # wedged at ~200x init scale under 10x, 1.5x and 1.05x
                    # per-step caps alike, where gradients are so large no η
                    # survives). Both caps are SGLDConfig fields — on
                    # non-z-scored problems whose posterior sits far from the
                    # init scale, raise adapt_trust.
                    nrm_old = jnp.sqrt(jnp.sum(p * p, axis=axes))
                    nrm_new = jnp.sqrt(jnp.sum(newp * newp, axis=axes))
                    bad = bad | ~(
                        nrm_new
                        <= config.adapt_rel_cap * nrm_old + config.adapt_rel_slack
                    )
                    if ref is not None:
                        bad = bad | ~(nrm_new <= config.adapt_trust * (ref + 1.0))
                rejected = rejected + jnp.sum(bad, dtype=jnp.int32)
                new_leaves.append(
                    jnp.where(bad[(...,) + (None,) * ev], p, newp)
                )

        new_params = jax.tree.unflatten(treedef, new_leaves)
        eta, stable = state.eta, state.stable
        if config.adapt_eps:
            # fleet-shared backoff: any rejection this step halves η; after
            # adapt_patience consecutive clean steps η creeps back (cap 1).
            # Under this state's scope "fleet" = every chain whose rejections
            # land in this state's counter (the whole fleet for chain-batched
            # runners; per-chain under vmap — runners that shard chains
            # re-reduce and re-broadcast η across the mesh).
            clean = (rejected - state.rejected) == 0
            stable = jnp.where(clean, state.stable + 1, 0)
            grown = jnp.minimum(eta * config.adapt_up, 1.0)
            eta = jnp.where(
                ~clean,
                jnp.maximum(eta * config.adapt_down, config.adapt_floor),
                jnp.where(stable >= config.adapt_patience, grown, eta),
            )
        return SGLDState(
            params=new_params,
            key=key,
            step=state.step + 1,
            rejected=rejected,
            precond=new_precond,
            eta=eta,
            stable=stable,
        )

    return step


# ---------------------------------------------------------------------------
# Full training runs: epoch shuffling + minibatching + thinned collection,
# all inside one jitted scan.
# ---------------------------------------------------------------------------


def _pad_data(N: int, m: int):
    """Static padding plan: B batches of size m covering N points."""
    B = -(-N // m)
    pad = B * m - N
    return B, pad


def _epoch_batches(key, N, B, m, pad):
    """Shuffled batch index matrix (B, m) + weights (B, m); pad entries → 0.

    Replaces the reference's in-place permutation + ragged last batch
    (``GPT_SGLD.jl:373-381``) with static shapes: a permutation of [0, N)
    padded with sentinel N, gathered from data arrays padded with one zero
    row.
    """
    perm = jax.random.permutation(key, N)
    idx = jnp.concatenate([perm, jnp.full((pad,), N, perm.dtype)])
    weights = jnp.concatenate(
        [jnp.ones((N,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
    )
    return idx.reshape(B, m), weights.reshape(B, m)


def run_sgld(
    model,
    params0,
    key: jax.Array,
    phi: jnp.ndarray,
    y: jnp.ndarray,
    *,
    m: int,
    config: SGLDConfig,
    burnin: int,
    maxepoch: int,
    collect_fn: Callable | None = None,
    initial_state: SGLDState | None = None,
):
    """Run one SGLD chain; returns (final_state, collected, rejected).

    Semantics of ``GPTregression``/``GPNT_SGLD``: per epoch, shuffle the data,
    sweep minibatches of size ``m``, update with the manifold-aware SGLD law.
    Collection is *thinned to epoch ends* — the reference stores every iterate
    (``GPT_SGLD.jl:358-359``, Q×T and n×r×D×T arrays) but its experiments only
    consume epoch-end samples and last-k averages (``kin40kExperiment.jl:78-87``),
    so the framework streams instead of materialising.

    ``collect_fn(params) -> pytree`` is evaluated at each post-burnin epoch
    end (default: the params themselves). The whole run is one ``lax.scan``
    over epochs (inner scan over batches) — a single XLA program.

    ``phi`` may be any pytree of arrays with a shared leading data axis (an
    ``(N, D, n)`` tensor-feature array, an ``(N, n)`` full-feature matrix, a
    ``(phiU, phiV)`` pair for the 2-D Kronecker models, …) — whatever the
    model's ``log_lik`` consumes.

    ``initial_state`` resumes a checkpointed run *exactly*: the state carries
    the PRNG key, so ``run(20 epochs)`` ≡ ``run(10) → checkpoint → resume(10)``
    bitwise (mid-run resume — absent from the reference, SURVEY.md §5).
    """
    N = y.shape[0]
    B, pad = _pad_data(N, m)
    phi_pad = jax.tree.map(
        lambda a: jnp.concatenate([a, jnp.zeros_like(a[:1])], axis=0), phi
    )
    y_pad = jnp.concatenate([y, jnp.zeros_like(y[:1])], axis=0)

    if collect_fn is None:
        collect_fn = lambda p: p

    def grad_fn(params, batch):
        idx, wts = batch

        def logp(p):
            phi_b = jax.tree.map(lambda a: a[idx], phi_pad)
            ll = model.log_lik(p, phi_b, y_pad[idx], weight=wts)
            scale = N / jnp.maximum(jnp.sum(wts), 1.0)
            # Sum over any leading chain axes: per-chain log-joints share no
            # parameters, so the gradient of the sum is the per-chain
            # gradient stack (enables chain-batched fused kernels).
            return jnp.sum(scale * ll + model.log_prior(p))

        return jax.grad(logp)(params)

    ref_norms = None
    if config.adapt_eps:
        p_init = (initial_state.params if initial_state is not None
                  else params0)
        ed = getattr(model, "event_ndims", None)

        def leaf_norm(p, e=None):
            ev = p.ndim if e is None else min(int(e), p.ndim)
            return jnp.sqrt(jnp.sum(p * p, axis=tuple(range(p.ndim - ev, p.ndim))))

        if ed is None:
            ref_norms = jax.tree.map(leaf_norm, p_init)
        else:
            leaves_p, td = jax.tree.flatten(p_init)
            ref_norms = jax.tree.unflatten(
                td, [leaf_norm(p, e) for p, e in
                     zip(leaves_p, td.flatten_up_to(ed))])

    step = make_sgld_step(
        grad_fn, model.manifolds, config,
        event_ndims=getattr(model, "event_ndims", None),
        ref_norms=ref_norms,
    )

    def epoch_body(state: SGLDState, _):
        key, kperm = jax.random.split(state.key)
        state = state._replace(key=key)
        idx, wts = _epoch_batches(kperm, N, B, m, pad)

        def batch_body(st, b):
            return step(st, (idx[b], wts[b])), None

        state, _ = jax.lax.scan(batch_body, state, jnp.arange(B))
        return state, collect_fn(state.params)

    state0 = initial_state if initial_state is not None else sgld_init(params0, key, config)
    final, collected = jax.lax.scan(epoch_body, state0, None, length=burnin + maxepoch)
    collected = jax.tree.map(lambda a: a[burnin:], collected)
    return final, collected


def run_sgld_chains(
    model,
    params0_chains,
    keys: jax.Array,
    phi: jnp.ndarray,
    y: jnp.ndarray,
    *,
    m: int,
    config: SGLDConfig,
    burnin: int,
    maxepoch: int,
    collect_fn: Callable | None = None,
):
    """Vmap :func:`run_sgld` over a leading chain axis of params0/keys.

    This is the reference's ``@parallel`` seed sweep
    (``SynthDataExperiment.jl:44``, ``kin40kExperiment.jl:67``) turned into a
    single batched XLA program; shard the chain axis over a device mesh with
    ``gpt_tpu.parallel``.
    """
    run = partial(
        run_sgld,
        model,
        phi=phi,
        y=y,
        m=m,
        config=config,
        burnin=burnin,
        maxepoch=maxepoch,
        collect_fn=collect_fn,
    )
    return jax.jit(jax.vmap(lambda p, k: run(p, k)))(params0_chains, keys)


def _pick_block(total: int, target: int) -> int:
    """Largest divisor of ``total`` that is ≤ ``target`` (≥ 1)."""
    for cand in range(min(target, total), 0, -1):
        if total % cand == 0:
            return cand
    return 1


def run_sgld_megafused(
    model,
    params0_chains,
    key: jax.Array,
    phi: jnp.ndarray,
    y: jnp.ndarray,
    *,
    m: int,
    config: SGLDConfig,
    burnin: int,
    maxepoch: int,
    collect_fn: Callable | None = None,
    chain_block: int = 16,
    data_chunk: int = 50,
    interpret: bool | None = None,
    stages: tuple = ("expand", "bwd", "manifold"),
    loo_bf16: bool | None = None,
):
    """Chain-fleet SGLD where EVERY transition is ONE fused Pallas kernel.

    The speed-of-light runner for ``TensorGP`` (stiefel=True, polar
    transport): forward, hand-derived backward, noise (in-kernel TPU PRNG),
    w update, tangent projection, Newton–Schulz polar retraction and the
    divergence check all execute inside a single ``pallas_call`` per step
    with chain-merged MXU shapes (see ``ops/pallas_sgld.py``). Breaks the
    >256-chain scaling cliff of the XLA-op-graph path: the (C, m, D, Q)
    backward intermediates and the C·D tiny manifold einsums never exist.

    Semantics: the update law of :func:`make_sgld_step` with
    ``transport="polar"``; chains share each epoch's minibatch permutation
    (like :func:`run_sgld_chains_fused`) but keep independent parameters and
    independent noise. The noise stream is the TPU hardware PRNG, not
    threefry, so runs are reproducible for a fixed seed/shape but not
    bit-identical to the vmap path — equivalence is exact for
    ``langevin=False`` and statistical otherwise (``tests/test_pallas_sgld.py``).

    ``adapt_eps`` here is PER-CHAIN (each chain's η, stable-step counter and
    init-scale trust-region refs live in its kernel lanes) with the FULL r4
    XLA-path semantics (``make_sgld_step``): η regrows only after
    ``adapt_patience`` consecutive clean steps, and finite-but-absurd
    Euclidean steps past ``adapt_rel_cap``/``adapt_trust`` of the init scale
    are rejected. The one remaining scope difference vs the XLA path is
    granularity: η/rejection are per chain here (a diverging chain cannot
    slow its blockmates) vs fleet-shared there, and the Euclidean-factor
    trust region checks per (chain, d) matrix vs the whole U leaf.

    Returns ``(params_final, collected, rejected_total)`` with params in the
    canonical (C, ...) layout.
    """
    from gpt_tpu.ops.contraction import core_indicator
    from gpt_tpu.ops.pallas_sgld import block_onehots, fused_sgld_step

    stiefel = bool(getattr(model, "stiefel", True))
    if stiefel and config.transport != "polar":
        raise NotImplementedError(
            "megafused runner: Stiefel factors require polar transport"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Classification (TensorGPClassifier): each (chain, class) pair becomes
    # a SUPER-chain in the kernel — per-class w/U are independent params and
    # the only cross-class coupling is the softmax residual, which the
    # kernel computes over class lane-groups (class minor within a block).
    ncls = int(getattr(model, "num_classes", 0) or 0)
    if ncls:
        Cc = params0_chains.w.shape[0]
        D_, n_, r_ = model.D, model.n, model.r
        params0_chains = type(params0_chains)(
            w=params0_chains.w.reshape(Cc * ncls, model.Q),
            U=params0_chains.U.reshape(Cc * ncls, D_, n_, r_),
        )

    C, Q = params0_chains.w.shape
    D, n, r = model.D, model.n, model.r
    if ncls:
        # class groups may not straddle chain blocks
        CB = ncls * _pick_block(C // ncls, max(1, chain_block // ncls))
    else:
        CB = _pick_block(C, chain_block)
    NB = C // CB
    mc = _pick_block(m, data_chunk)
    Mch = m // mc
    N = y.shape[0]
    B, pad = _pad_data(N, m)

    eps = config.eps
    eps_w = float(eps.w if hasattr(eps, "w") else eps)
    eps_U = float(eps.U if hasattr(eps, "U") else eps)
    ns_iters = 1

    phi_pad = jnp.concatenate([phi, jnp.zeros_like(phi[:1])], axis=0)
    phi_bf16 = phi_pad.astype(jnp.bfloat16)
    y_pad = jnp.concatenate([y, jnp.zeros_like(y[:1])], axis=0)
    onehot = core_indicator(model.I, r, dtype=jnp.float32)          # (Q, D, r)
    ohf = block_onehots(onehot, CB)
    # VMEM-compact backward for big D·Q shapes (e.g. segment classification
    # Q=200, D=16): the D retained g_d + suffix products exceed VMEM in f32
    if loo_bf16 is None:
        loo_bf16 = 2 * D * mc * CB * Q * 4 > 6_000_000

    if collect_fn is None:
        collect_fn = _collect_params

    params_cls = type(params0_chains)

    def to_internal(p):
        # w lanes are (chain, q) chain-major: (NB, CB, Q) -> (NB, 1, CB*Q)
        w3 = p.w.reshape(NB, 1, CB * Q)
        U4 = jnp.transpose(
            p.U.reshape(NB, CB, D, n, r), (0, 2, 3, 1, 4)
        ).reshape(NB, D, n, CB * r)
        return w3, U4

    w3_0, U4_0 = to_internal(params0_chains)
    if config.adapt_eps:
        # per-chain init-scale norms arm the trust region (refs row 0: w,
        # rows 1..D: U_d) — lane order matches to_internal's chain-major
        nw = jnp.linalg.norm(
            params0_chains.w.reshape(NB, CB, Q), axis=-1)       # (NB, CB)
        nU = jnp.linalg.norm(
            params0_chains.U.reshape(NB, CB, D, n * r), axis=-1)  # (NB, CB, D)
        refs0 = jnp.concatenate(
            [nw[:, None, :], jnp.transpose(nU, (0, 2, 1))], axis=1
        ).astype(jnp.float32)                                   # (NB, 1+D, CB)
    else:
        refs0 = jnp.zeros((0,), jnp.float32)
    kseed, kperm_base, knoise_base = jax.random.split(key, 3)
    base_seed = jax.random.randint(kseed, (), 0, jnp.iinfo(jnp.int32).max,
                                   dtype=jnp.int32)

    program = _megafused_program(
        params_cls, D, n, r, Q, CB, NB, mc, Mch, N, B, pad, m,
        eps_w, eps_U, float(config.decay), bool(config.langevin), ns_iters,
        float(model.sigma_w) ** 2,
        float(getattr(model, "signal_var", 1.0)),
        tuple(stages), bool(interpret), burnin, maxepoch, collect_fn,
        bool(config.adapt_eps), float(config.adapt_down),
        float(config.adapt_up), float(config.adapt_floor),
        stiefel, bool(config.rmsprop), float(config.rmsprop_alpha),
        float(config.rmsprop_lambda), ncls,
        int(config.adapt_patience), float(config.adapt_trust),
        float(config.adapt_rel_cap), float(config.adapt_rel_slack),
        bool(loo_bf16),
    )
    return program(w3_0, U4_0, phi_bf16, y_pad, ohf, refs0, base_seed,
                   kperm_base, knoise_base)


def _collect_params(p):
    return p


def collect_nothing(p):
    """Collect-nothing ``collect_fn`` for pure-throughput runs.

    Module-level (stable identity) so repeated :func:`run_sgld_megafused`
    calls hit the cached jitted program — a fresh ``lambda p: ()`` per call
    would force a full re-trace each time.
    """
    return ()


@lru_cache(maxsize=64)
def _megafused_program(
    params_cls, D, n, r, Q, CB, NB, mc, Mch, N, B, pad, m,
    eps_w, eps_U, decay, langevin, ns_iters, sigma_w2, signal_var,
    stages, interpret, burnin, maxepoch, collect_fn,
    adapt=False, a_down=0.5, a_up=1.05, a_floor=1e-4,
    stiefel=True, rmsprop=False, rms_alpha=0.99, rms_lambda=1e-5,
    ncls=0, a_patience=50, a_trust=100.0, a_rel_cap=1.05, a_rel_slack=1.0,
    loo_bf16=False,
):
    """Build (once per static configuration) the jitted megafused run program.

    Re-wrapping ``jax.jit`` per call would re-trace the whole epoch/batch scan
    every invocation — measured ~5-10 s of host time per call, dwarfing the
    device time of the entire run. The cache key includes ``collect_fn`` BY
    IDENTITY: pass a module-level function (not a fresh lambda) to hit it.
    """
    from gpt_tpu.ops.pallas_sgld import fused_sgld_step

    C = NB * CB
    input_noise = interpret and langevin

    def to_canonical(w3, U4):
        w = w3.reshape(C, Q)
        U = jnp.transpose(
            U4.reshape(NB, D, n, CB, r), (0, 3, 1, 2, 4)
        ).reshape(C, D, n, r)
        if ncls:  # super-chains back to (chain, class, ...) classifier shape
            w = w.reshape(C // ncls, ncls, Q)
            U = U.reshape(C // ncls, ncls, D, n, r)
        return params_cls(w=w, U=U)

    def batch_body(phi_bf16, y_pad, ohf, refs, base_seed, knoise_base,
                   carry, b_and_idx):
        w3, U4, eta3, stable3, Gw3, GU4, step, rejected = carry
        idx, wts = b_and_idx
        phi_b = phi_bf16[idx].reshape(Mch, mc, D, n)
        y_b = y_pad[idx].reshape(Mch, mc, 1)
        wts_b = wts.reshape(Mch, mc, 1)
        nwts = jnp.sum(wts)
        scale = N / jnp.maximum(nwts, 1.0)
        t = step.astype(jnp.float32) + 1.0
        decay_t = t ** (-decay) if decay else 1.0
        scalars = jnp.stack(
            [scale, eps_w * decay_t, eps_U * decay_t, jnp.float32(a_down),
             jnp.float32(a_up), jnp.float32(a_floor),
             jnp.float32(rms_alpha), jnp.float32(rms_lambda),
             jnp.float32(a_patience), jnp.float32(a_trust),
             jnp.float32(a_rel_cap), jnp.float32(a_rel_slack)]
        ).reshape(1, 12)
        seed = (base_seed + step * jnp.int32(2654435761 & 0x7FFFFFFF)).reshape(1, 1)
        noise = None
        if input_noise:
            kn = jax.random.fold_in(knoise_base, step)
            k1, k2 = jax.random.split(kn)
            noise = (
                jax.random.normal(k1, (NB, 1, CB * Q), jnp.float32),
                jax.random.normal(k2, (NB, D, n, CB * r), jnp.float32),
            )
        outs = list(fused_sgld_step(
            w3, U4, phi_b, y_b, wts_b, ohf, scalars, seed,
            r=r, ns_iters=ns_iters, langevin=langevin,
            sigma_w2=sigma_w2, signal_var=signal_var,
            interpret=interpret, noise=noise, stages=stages,
            adapt_state=(eta3, stable3, refs) if adapt else None,
            stiefel=stiefel,
            precond=(Gw3, GU4) if rmsprop else None,
            num_classes=ncls, loo_bf16=loo_bf16,
        ))
        w3n, U4n, rej = outs[:3]
        eta3n, stable3n = outs[3:5] if adapt else (eta3, stable3)
        Gw3n, GU4n = outs[-2:] if rmsprop else (Gw3, GU4)
        rej_total = rejected + jnp.sum(rej, dtype=jnp.int32)
        return (w3n, U4n, eta3n, stable3n, Gw3n, GU4n, step + 1,
                rej_total), None

    @jax.jit
    def run(w3, U4, phi_bf16, y_pad, ohf, refs, base_seed, kperm_base,
            knoise_base):
        def epoch_body(carry, e):
            kperm = jax.random.fold_in(kperm_base, e)
            idx, wts = _epoch_batches(kperm, N, B, m, pad)
            carry, _ = jax.lax.scan(
                partial(batch_body, phi_bf16, y_pad, ohf, refs, base_seed,
                        knoise_base),
                carry,
                (idx, wts),
            )
            return carry, collect_fn(to_canonical(carry[0], carry[1]))

        if rmsprop:
            Gw0 = jnp.zeros((NB, 1, CB * Q), jnp.float32)
            GU0 = jnp.zeros((NB, D, n, CB * r), jnp.float32)
        else:  # zero-size placeholders — no HBM cost when unused
            Gw0 = GU0 = jnp.zeros((0,), jnp.float32)
        carry0 = (w3, U4, jnp.ones((NB, 1, CB), jnp.float32),
                  jnp.zeros((NB, 1, CB), jnp.float32), Gw0, GU0,
                  jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        (w3f, U4f, _, _, _, _, _, rejected), collected = jax.lax.scan(
            epoch_body, carry0, jnp.arange(burnin + maxepoch)
        )
        collected = jax.tree.map(lambda a: a[burnin:], collected)
        return to_canonical(w3f, U4f), collected, rejected

    return run


def megafused_supported(model, config: SGLDConfig) -> bool:
    """Whether (model, config) can run on the megafused Pallas path.

    The kernel covers Stiefel factors (polar transport only — geodesic/Cayley
    need the 2r×2r solve the kernel deliberately avoids), Euclidean factors
    (``model.stiefel=False``, the r>n configs), and in-kernel RMSprop — each
    with an XLA-parity test (``tests/test_pallas_sgld.py``).
    """
    stf = getattr(model, "stiefel", True)
    return (
        hasattr(model, "I")  # tensor-core models only (w, U) — not full-theta
        and (not stf or config.transport == "polar")
        and jax.default_backend() == "tpu"
    )


def run_sgld_auto(
    model,
    params0_chains,
    key: jax.Array,
    phi: jnp.ndarray,
    y: jnp.ndarray,
    *,
    m: int,
    config: SGLDConfig,
    burnin: int,
    maxepoch: int,
    collect_fn: Callable | None = None,
    megafused_threshold: int = 256,
):
    """Dispatch a chain fleet to the best single-chip engine by fleet size.

    SCALING_chains.md's measured envelope: the XLA op-graph path peaks at
    ≤256 VMEM-resident chains (~630k chain-steps/s) and collapses past that;
    the megafused Pallas kernel is monotone through 8192 chains and overtakes
    the XLA path above ~256. This picks the envelope automatically:
    ``C > megafused_threshold`` and :func:`megafused_supported` → megafused
    kernel, otherwise the XLA fused-chain path (with the chain-merged
    contraction where the model allows it).

    Returns the megafused signature ``(params_final, collected, rejected)``
    for both engines; ``collected`` leaves are ``(epochs, C, ...)`` on both
    branches (the XLA branch's per-chain-major layout is swapped back).
    """
    C = jax.tree.leaves(params0_chains)[0].shape[0]
    if C > megafused_threshold and megafused_supported(model, config):
        return run_sgld_megafused(
            model, params0_chains, key, phi, y, m=m, config=config,
            burnin=burnin, maxepoch=maxepoch, collect_fn=collect_fn,
        )
    final, collected = run_sgld_chains_fused(
        model, params0_chains, key, phi, y, m=m, config=config,
        burnin=burnin, maxepoch=maxepoch, collect_fn=collect_fn,
    )
    # run_sgld_chains_fused returns collected as (C, epochs, ...); the
    # megafused engine yields (epochs, C, ...). Callers must see ONE layout
    # regardless of which engine the threshold picked — normalise to the
    # megafused (epochs, C, ...) contract.
    collected = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), collected)
    return final.params, collected, jnp.sum(final.rejected)


def run_sgld_chains_fused(
    model,
    params0_chains,
    key: jax.Array,
    phi: jnp.ndarray,
    y: jnp.ndarray,
    *,
    m: int,
    config: SGLDConfig,
    burnin: int,
    maxepoch: int,
    collect_fn: Callable | None = None,
):
    """Chain-batched (non-vmapped) SGLD: all chains advance through ONE
    transition kernel whose operands carry a leading chain axis.

    Semantics vs :func:`run_sgld_chains`: chains share the per-epoch data
    permutation (one minibatch sequence drives the whole fleet) but keep
    independent parameters and independent injected noise (noise is drawn
    with the full chain-stacked shape). Each chain still targets the exact
    posterior; only the *stochastic-gradient* randomness is common across
    chains — the same situation as the reference running its seed sweep on a
    fixed pre-shuffled dataset.

    Why it exists: with the chain axis explicit (not a vmap dim), the model
    can route prediction through the chain-batched fused Pallas kernel
    (``TensorGP(contraction="pallas")``), keeping the whole
    φ→V→fhat→backward chain in VMEM per chain.
    """
    if collect_fn is None:
        collect_fn = lambda p: p

    @jax.jit
    def _run(p, k):
        final, collected = run_sgld(
            model, p, k, phi, y, m=m, config=config,
            burnin=burnin, maxepoch=maxepoch, collect_fn=collect_fn,
        )
        # (epoch, chain, ...) → (chain, epoch, ...) to match run_sgld_chains.
        collected = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), collected)
        return final, collected

    return _run(params0_chains, key)
