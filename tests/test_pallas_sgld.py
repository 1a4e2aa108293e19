"""Fully-fused Pallas SGLD transition kernel (`run_sgld_megafused`).

Interpret-mode checks on CPU. The megafused kernel shares the update law and
the per-epoch minibatch stream with `run_sgld_chains_fused` but runs its
likelihood path in bf16 and draws noise in-kernel on TPU; here we run
interpret mode, where Langevin noise is injected (threefry) so determinism
checks are possible. Equivalence vs the XLA-op-graph path is exact (to bf16
matmul tolerance) with ``langevin=False``; with noise we check statistical
health: independent chains decorrelate, factors stay on the Stiefel
manifold, and divergent steps are rejected per-chain without poisoning the
rest of the fleet (the reference aborts the whole run to zeros instead,
``GPT_SGLD.jl:422-424``).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_tpu.inference import SGLDConfig
from gpt_tpu.inference.sgld import run_sgld_chains_fused, run_sgld_megafused
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams


def _setup(key, C=4, N=40, D=3, n=16, r=4, Q=12, signal_var=0.1):
    kI, kphi, ky, kp, ks = jax.random.split(key, 5)
    I = sample_core_indices(kI, r, D, Q)
    phi = jax.random.normal(kphi, (N, D, n), jnp.float32) * 0.3
    y = jax.random.normal(ky, (N,), jnp.float32)
    model = TensorGP(n=n, r=r, D=D, I=I, signal_var=signal_var)
    params0 = jax.vmap(model.init_params)(jax.random.split(kp, C))
    params0 = jax.tree.map(lambda a: a.astype(jnp.float32), params0)
    return model, params0, phi, y, ks


def _orth_err(U, r):
    UtU = jnp.einsum("cdni,cdnj->cdij", U, U)
    return float(jnp.max(jnp.abs(UtU - jnp.eye(r, dtype=UtU.dtype))))


def test_megafused_matches_fused_xla_deterministic(key):
    """langevin=False: megafused endpoint ≡ XLA fused endpoint (bf16 tol)."""
    model, params0, phi, y, ks = _setup(key)
    config = SGLDConfig(
        eps=TensorGPParams(w=1e-4, U=1e-6), transport="polar", langevin=False
    )
    mf_final, _, rej = run_sgld_megafused(
        model, params0, ks, phi, y, m=8, config=config, burnin=3, maxepoch=0,
        collect_fn=lambda p: (), chain_block=2, data_chunk=4,
    )
    xla_final, _ = run_sgld_chains_fused(
        model, params0, ks, phi, y, m=8, config=config, burnin=3, maxepoch=0,
        collect_fn=lambda p: (),
    )
    assert int(rej) == 0
    np.testing.assert_allclose(
        np.asarray(mf_final.w), np.asarray(xla_final.params.w),
        rtol=2e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(mf_final.U), np.asarray(xla_final.params.U),
        rtol=2e-3, atol=2e-5,
    )


def test_megafused_block_shape_invariance(key):
    """The (chain_block, data_chunk) tiling must not change the math."""
    model, params0, phi, y, ks = _setup(key)
    config = SGLDConfig(
        eps=TensorGPParams(w=1e-4, U=1e-6), transport="polar", langevin=False
    )
    outs = []
    for cb, dc in ((1, 8), (2, 4), (4, 2)):
        final, _, _ = run_sgld_megafused(
            model, params0, ks, phi, y, m=8, config=config, burnin=2,
            maxepoch=0, collect_fn=lambda p: (), chain_block=cb, data_chunk=dc,
        )
        outs.append(final)
    for other in outs[1:]:
        np.testing.assert_allclose(
            np.asarray(outs[0].w), np.asarray(other.w), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(outs[0].U), np.asarray(other.U), rtol=1e-4, atol=1e-6
        )


def test_megafused_langevin_decorrelates_and_stays_on_manifold(key):
    model, params0, phi, y, ks = _setup(key)
    # identical params in every chain: only noise can separate them
    tied = jax.tree.map(
        lambda a: jnp.broadcast_to(a[:1], a.shape), params0
    )
    config = SGLDConfig(
        eps=TensorGPParams(w=1e-3, U=1e-5), transport="polar", langevin=True
    )
    final, _, rej = run_sgld_megafused(
        model, tied, ks, phi, y, m=8, config=config, burnin=4, maxepoch=0,
        collect_fn=lambda p: (), chain_block=2, data_chunk=4,
    )
    assert int(rej) == 0
    spread = float(jnp.max(jnp.std(final.w, axis=0)))
    assert spread > 1e-4, "chains received correlated (or zero) noise"
    assert _orth_err(final.U, model.r) < 1e-3


def test_megafused_rejects_divergent_chains_individually(key):
    """A blown-up step size must be rejected (params held), not propagated."""
    model, params0, phi, y, ks = _setup(key, signal_var=1e-6)
    config = SGLDConfig(
        eps=TensorGPParams(w=1e-4, U=1e4), transport="polar", langevin=False
    )
    final, _, rej = run_sgld_megafused(
        model, params0, ks, phi, y, m=8, config=config, burnin=1, maxepoch=0,
        collect_fn=lambda p: (), chain_block=2, data_chunk=4,
    )
    assert int(rej) > 0
    # rejected chains keep their previous (orthonormal) factors
    assert _orth_err(final.U, model.r) < 1e-3
    assert bool(jnp.all(jnp.isfinite(final.w)))


def test_megafused_collect_and_epoch_axis(key):
    model, params0, phi, y, ks = _setup(key)
    config = SGLDConfig(
        eps=TensorGPParams(w=1e-4, U=1e-6), transport="polar", langevin=False
    )
    _, collected, _ = run_sgld_megafused(
        model, params0, ks, phi, y, m=8, config=config, burnin=1, maxepoch=3,
        collect_fn=lambda p: jnp.mean(p.w, axis=-1), chain_block=2,
        data_chunk=4,
    )
    assert collected.shape == (3, 4)  # (kept epochs, chains)


def test_megafused_rejects_unsupported_configs(key):
    model, params0, phi, y, ks = _setup(key)
    with pytest.raises(NotImplementedError):
        run_sgld_megafused(
            model, params0, ks, phi, y, m=8,
            config=SGLDConfig(eps=1e-4, transport="cayley"),
            burnin=1, maxepoch=0,
        )


def test_megafused_nan_containment_within_block(key):
    """One corrupted chain must not poison its CB-block: masked reduction
    matmuls leak NaN*0 across lanes unless the kernel scrubs operands
    (the bug this guards against killed whole 8-chain blocks on TPU)."""
    import numpy as np_

    model, params0, phi, y, ks = _setup(key, C=4)
    w = np_.array(params0.w)
    U = np_.array(params0.U)
    U[1, 0, 5, 3] = np_.nan     # chain 1: NaN factor entry
    w[2, 3] = np_.nan           # chain 2: NaN core weight
    U[3] *= 1e25                # chain 3: absurd but finite
    corrupted = type(params0)(w=jnp.asarray(w), U=jnp.asarray(U))

    config = SGLDConfig(
        eps=TensorGPParams(w=1e-4, U=1e-6), transport="polar", langevin=True
    )
    final, _, rej = run_sgld_megafused(
        model, corrupted, ks, phi, y, m=8, config=config, burnin=2,
        maxepoch=0, collect_fn=lambda p: (), chain_block=4, data_chunk=4,
    )
    # chain 0 (clean, same block as all three corrupted chains) sampled on
    assert bool(jnp.all(jnp.isfinite(final.w[0])))
    assert bool(jnp.all(jnp.isfinite(final.U[0])))
    UtU0 = jnp.einsum("dni,dnj->dij", final.U[0], final.U[0])
    assert float(jnp.max(jnp.abs(UtU0 - jnp.eye(model.r)))) < 1e-3
    assert float(jnp.max(jnp.abs(final.w[0] - params0.w[0]))) > 0  # moved
    # corrupted chains were rejected (frozen), not "fixed" silently
    assert int(rej) >= 2 * 2  # >= (w-NaN + U-NaN chains) x 2 steps
    np.testing.assert_array_equal(np.asarray(final.U[1]), np.asarray(U[1]))
    np.testing.assert_array_equal(np.asarray(final.w[2]), np.asarray(w[2]))


def test_megafused_sharded_matches_per_shard_runs(key):
    """(chips) x (blocks) x (chains): the shard_map fleet must equal the
    concatenation of per-device megafused runs (langevin=False, exact)."""
    from gpt_tpu.parallel import make_mesh
    from gpt_tpu.parallel.chains import run_sgld_megafused_sharded

    mesh = make_mesh()
    ndev = mesh.shape["chain"]
    C = 2 * ndev
    model, _, phi, y, _ = _setup(key, C=C)
    config = SGLDConfig(
        eps=TensorGPParams(w=1e-4, U=1e-6), transport="polar", langevin=False
    )
    final, collected, rej = run_sgld_megafused_sharded(
        model, mesh, key, phi, y, num_chains=C, m=8, config=config,
        burnin=1, maxepoch=2, chain_block=2, data_chunk=4,
    )
    assert int(rej) == 0
    assert collected.w.shape[:2] == (2, C)

    # reference: per-device unsharded runs with the same key folding
    kinit, krun = jax.random.split(key)
    params0 = jax.vmap(model.init_params)(jax.random.split(kinit, C))
    params0 = jax.tree.map(lambda a: a.astype(jnp.float32), params0)
    Cl = C // ndev
    for dev in range(ndev):
        kd = jax.random.fold_in(krun, dev)
        local0 = jax.tree.map(lambda a: a[dev * Cl:(dev + 1) * Cl], params0)
        f_local, _, _ = run_sgld_megafused(
            model, local0, kd, phi, y, m=8, config=config, burnin=1,
            maxepoch=2, collect_fn=lambda p: (), chain_block=2, data_chunk=4,
        )
        np.testing.assert_allclose(
            np.asarray(final.w[dev * Cl:(dev + 1) * Cl]),
            np.asarray(f_local.w), rtol=1e-6, atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(final.U[dev * Cl:(dev + 1) * Cl]),
            np.asarray(f_local.U), rtol=1e-6, atol=1e-7,
        )


def test_megafused_adapt_eps_identity_when_stable(key):
    """adapt_eps with no rejections must be bitwise-identical to fixed eps
    (eta stays 1 for every chain)."""
    model, params0, phi, y, ks = _setup(key)
    base = SGLDConfig(
        eps=TensorGPParams(w=1e-4, U=1e-6), transport="polar", langevin=False
    )
    outs = []
    for cfg in (base, dataclasses.replace(base, adapt_eps=True)):
        final, _, rej = run_sgld_megafused(
            model, params0, ks, phi, y, m=8, config=cfg, burnin=2,
            maxepoch=0, collect_fn=lambda p: (), chain_block=2, data_chunk=4,
        )
        assert int(rej) == 0
        outs.append(final)
    np.testing.assert_array_equal(np.asarray(outs[0].w), np.asarray(outs[1].w))
    np.testing.assert_array_equal(np.asarray(outs[0].U), np.asarray(outs[1].U))


def test_megafused_adapt_eps_recovers_hot_config(key):
    """A step size that rejects every fixed-eps step must self-recover with
    per-chain adaptation: eta backs off until steps are accepted and the
    chains actually move (the temperature-Kron divergence scenario)."""
    model, params0, phi, y, ks = _setup(key)
    hot = SGLDConfig(
        eps=TensorGPParams(w=1e-4, U=10.0), transport="polar", langevin=False
    )
    frozen, _, rej_fixed = run_sgld_megafused(
        model, params0, ks, phi, y, m=8, config=hot, burnin=4, maxepoch=0,
        collect_fn=lambda p: (), chain_block=2, data_chunk=4,
    )
    # fixed eps: every U transport rejected, factors never move
    assert int(rej_fixed) > 0
    np.testing.assert_array_equal(np.asarray(frozen.U), np.asarray(params0.U))

    adapted, _, rej_adapt = run_sgld_megafused(
        model, params0, ks, phi, y,
        m=8, config=dataclasses.replace(hot, adapt_eps=True),
        burnin=4, maxepoch=0, collect_fn=lambda p: (), chain_block=2,
        data_chunk=4,
    )
    moved = float(jnp.max(jnp.abs(adapted.U - params0.U)))
    assert moved > 0, "adaptation never unblocked the chains"
    UtU = jnp.einsum("cdni,cdnj->cdij", adapted.U, adapted.U)
    assert float(jnp.max(jnp.abs(UtU - jnp.eye(model.r)))) < 1e-3


def test_megafused_adapt_patience_semantics(key):
    """Kernel-level check of the r5 adaptation port (XLA make_sgld_step
    semantics): a rejection halves eta and zeroes the stable counter; eta
    regrows only after `adapt_patience` consecutive clean steps."""
    from gpt_tpu.ops.contraction import core_indicator
    from gpt_tpu.ops.pallas_sgld import block_onehots, fused_sgld_step

    model, params0, phi, y, ks = _setup(key, C=2)
    C, Q = params0.w.shape
    D, n, r = model.D, model.n, model.r
    CB, NB = C, 1
    w3 = params0.w.reshape(NB, 1, CB * Q)
    U4 = jnp.transpose(
        params0.U.reshape(NB, CB, D, n, r), (0, 2, 3, 1, 4)
    ).reshape(NB, D, n, CB * r)
    ohf = block_onehots(core_indicator(model.I, r, dtype=jnp.float32), CB)
    m = 8
    phi_b = phi[:m].astype(jnp.bfloat16).reshape(1, m, D, n)
    y_b = y[:m].reshape(1, m, 1)
    wts = jnp.ones((1, m, 1), jnp.float32)
    seed = jnp.zeros((1, 1), jnp.int32)
    nw = jnp.linalg.norm(params0.w, axis=-1).reshape(NB, 1, CB)
    nU = jnp.linalg.norm(
        params0.U.reshape(NB, CB, D, n * r), axis=-1)
    refs = jnp.concatenate(
        [nw, jnp.transpose(nU, (0, 2, 1))], axis=1).astype(jnp.float32)

    def scalars(eps_U):
        # [scale, eps_w, eps_U, down, up, floor, rms_a, rms_l,
        #  patience, trust, rel_cap, rel_slack]
        return jnp.array([[1.0, 1e-5, eps_U, 0.5, 1.05, 1e-8, 0.99, 1e-5,
                           3.0, 100.0, 1.05, 1.0]], jnp.float32)

    eta = jnp.ones((NB, 1, CB), jnp.float32)
    stable = jnp.zeros((NB, 1, CB), jnp.float32)

    def step(eps_U, eta, stable):
        w3n, U4n, rej, eta_n, stable_n = fused_sgld_step(
            w3, U4, phi_b, y_b, wts, ohf, scalars(eps_U), seed,
            r=r, langevin=False, sigma_w2=float(model.sigma_w) ** 2,
            signal_var=float(model.signal_var), interpret=True,
            adapt_state=(eta, stable, refs),
        )
        return np.asarray(rej), np.asarray(eta_n), np.asarray(stable_n)

    # step 1: exploding transport -> every chain rejects, eta halves
    rej, eta, stable = step(50.0, eta, stable)
    assert rej.sum() > 0
    np.testing.assert_allclose(eta, 0.5)
    np.testing.assert_allclose(stable, 0.0)
    # clean steps: eta must HOLD at 0.5 until patience(3) is reached
    for want_stable, want_eta in [(1, 0.5), (2, 0.5), (3, 0.5 * 1.05)]:
        rej, eta, stable = step(1e-8, jnp.asarray(eta), jnp.asarray(stable))
        assert rej.sum() == 0
        np.testing.assert_allclose(stable, float(want_stable))
        np.testing.assert_allclose(eta, want_eta, rtol=1e-6)


def test_megafused_trust_region_rejects_finite_cascade(key):
    """adapt_eps arms the init-scale trust region in-kernel: a FINITE but
    absurd Euclidean step (the temperature-Kron wedge class) is rejected;
    without adaptation the same step is accepted. Cross-engine: the XLA path
    clamps the same scenario."""
    model, params0, phi, y, ks = _setup(key)
    model = dataclasses.replace(model, stiefel=False)
    # eps_w large enough that the half-step drift cascades to ~1e5x the init
    # scale within one epoch while every individual value stays FINITE (the
    # class the NaN guard alone cannot catch)
    hot = SGLDConfig(
        eps=TensorGPParams(w=10.0, U=1e-8), transport="polar", langevin=False
    )
    fixed, _, rej_fixed = run_sgld_megafused(
        model, params0, ks, phi, y, m=8, config=hot, burnin=1, maxepoch=0,
        collect_fn=lambda p: (), chain_block=2, data_chunk=4,
    )
    grew = float(jnp.max(jnp.linalg.norm(fixed.w, axis=-1)))
    ref = float(jnp.max(jnp.linalg.norm(params0.w, axis=-1)))
    assert int(rej_fixed) == 0 and grew > 100.0 * (ref + 1.0), (grew, ref)

    guarded, _, rej_adapt = run_sgld_megafused(
        model, params0, ks, phi, y, m=8,
        config=dataclasses.replace(hot, adapt_eps=True),
        burnin=1, maxepoch=0, collect_fn=lambda p: (), chain_block=2,
        data_chunk=4,
    )
    assert int(rej_adapt) > 0
    assert float(jnp.max(jnp.linalg.norm(guarded.w, axis=-1))) <= 100.0 * (ref + 1.0)

    # XLA engine, same scenario: trust region holds there too (engine parity)
    xla_final, _ = run_sgld_chains_fused(
        model, params0, ks, phi, y, m=8,
        config=dataclasses.replace(hot, adapt_eps=True),
        burnin=1, maxepoch=0, collect_fn=lambda p: (),
    )
    assert float(jnp.max(jnp.linalg.norm(xla_final.params.w, axis=-1))) <= (
        100.0 * (ref + 1.0)
    )


def test_megafused_loo_bf16_parity(key):
    """The VMEM-compact backward (bf16 retained g_d / suffix products) tracks
    the f32 backward within bf16 gradient tolerance."""
    model, params0, phi, y, ks = _setup(key)
    config = SGLDConfig(
        eps=TensorGPParams(w=1e-4, U=1e-6), transport="polar", langevin=False
    )
    outs = []
    for compact in (False, True):
        final, _, rej = run_sgld_megafused(
            model, params0, ks, phi, y, m=8, config=config, burnin=3,
            maxepoch=0, collect_fn=lambda p: (), chain_block=2, data_chunk=4,
            loo_bf16=compact,
        )
        assert int(rej) == 0
        outs.append(final)
    np.testing.assert_allclose(
        np.asarray(outs[0].w), np.asarray(outs[1].w), rtol=2e-2, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(outs[0].U), np.asarray(outs[1].U), rtol=2e-2, atol=2e-4,
    )


def test_megafused_euclidean_matches_fused_xla(key):
    """stiefel=False (Gaussian-prior factors): megafused ≡ XLA, langevin=False.

    The Euclidean-factor mode lifts the r3 stiefel-only restriction
    (VERDICT r3 ask #6) — the r>n configuration where orthonormal frames
    don't exist."""
    model, params0, phi, y, ks = _setup(key)
    model = dataclasses.replace(model, stiefel=False)
    params0 = jax.vmap(model.init_params)(
        jax.random.split(jax.random.PRNGKey(31), 4)
    )
    config = SGLDConfig(
        eps=TensorGPParams(w=1e-4, U=1e-6), transport="polar", langevin=False
    )
    mf_final, _, rej = run_sgld_megafused(
        model, params0, ks, phi, y, m=8, config=config, burnin=3, maxepoch=0,
        collect_fn=lambda p: (), chain_block=2, data_chunk=4,
    )
    xla_final, _ = run_sgld_chains_fused(
        model, params0, ks, phi, y, m=8, config=config, burnin=3, maxepoch=0,
        collect_fn=lambda p: (),
    )
    assert int(rej) == 0
    np.testing.assert_allclose(
        np.asarray(mf_final.w), np.asarray(xla_final.params.w),
        rtol=2e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(mf_final.U), np.asarray(xla_final.params.U),
        rtol=2e-3, atol=2e-5,
    )


def test_megafused_euclidean_r_gt_n(key):
    """r > n runs in Euclidean mode (the ImageExperiment-style shape) and
    stays finite — impossible on the Stiefel path."""
    kI, kphi, ky, ks = jax.random.split(key, 4)
    n, r, D, Q = 3, 6, 3, 10
    I = sample_core_indices(kI, r, D, Q)
    phi = jax.random.normal(kphi, (12, D, n), jnp.float32) * 0.3
    y = jax.random.normal(ky, (12,), jnp.float32)
    model = TensorGP(n=n, r=r, D=D, I=I, signal_var=0.1, stiefel=False)
    params0 = jax.vmap(model.init_params)(
        jax.random.split(jax.random.PRNGKey(33), 4)
    )
    config = SGLDConfig(
        eps=TensorGPParams(w=1e-4, U=1e-5), transport="polar", langevin=True
    )
    final, _, rej = run_sgld_megafused(
        model, params0, ks, phi, y, m=8, config=config, burnin=4, maxepoch=0,
        collect_fn=lambda p: (), chain_block=2, data_chunk=4,
    )
    assert int(rej) == 0
    assert bool(jnp.all(jnp.isfinite(final.w)))
    assert bool(jnp.all(jnp.isfinite(final.U)))
    # factors actually moved
    assert float(jnp.max(jnp.abs(final.U - params0.U))) > 1e-6


@pytest.mark.parametrize("stiefel", [True, False])
def test_megafused_rmsprop_matches_fused_xla(key, stiefel):
    """rmsprop preconditioning in-kernel ≡ the XLA path (langevin=False):
    elementwise second moments for Euclidean leaves, per-matrix mean scalar
    geodesic time for Stiefel leaves (GPT_SGLD.jl:1206-1210)."""
    model, params0, phi, y, ks = _setup(key)
    if not stiefel:
        model = dataclasses.replace(model, stiefel=False)
        params0 = jax.vmap(model.init_params)(
            jax.random.split(jax.random.PRNGKey(35), 4)
        )
    config = SGLDConfig(
        eps=TensorGPParams(w=1e-4, U=1e-6), transport="polar",
        langevin=False, rmsprop=True,
    )
    mf_final, _, rej = run_sgld_megafused(
        model, params0, ks, phi, y, m=8, config=config, burnin=3, maxepoch=0,
        collect_fn=lambda p: (), chain_block=2, data_chunk=4,
    )
    xla_final, _ = run_sgld_chains_fused(
        model, params0, ks, phi, y, m=8, config=config, burnin=3, maxepoch=0,
        collect_fn=lambda p: (),
    )
    assert int(rej) == 0
    # looser than the plain-SGLD parity check: the preconditioner divides by
    # |g|, so the kernel's bf16 likelihood-path rounding becomes RELATIVE
    # error in the step (1/(lam+sqrt(G)) ~ 1/|g| amplification) instead of
    # being scaled down by eps
    np.testing.assert_allclose(
        np.asarray(mf_final.w), np.asarray(xla_final.params.w),
        rtol=5e-2, atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(mf_final.U), np.asarray(xla_final.params.U),
        rtol=5e-2, atol=5e-3,
    )


def test_fused_grad_fn_matches_autodiff(key):
    """grad_only kernel ≡ jax.grad of the log-joint (bf16 tolerance) —
    the GMC fleet-gradient hot path (make_fused_grad_fn)."""
    from gpt_tpu.ops.pallas_sgld import make_fused_grad_fn

    for stiefel in (True, False):
        model, params0, phi, y, _ = _setup(jax.random.fold_in(key, stiefel))
        if not stiefel:
            model = dataclasses.replace(model, stiefel=False)
            params0 = jax.vmap(model.init_params)(
                jax.random.split(jax.random.PRNGKey(41), 4)
            )
        grad_k = make_fused_grad_fn(model, phi, y, data_chunk=16,
                                    interpret=True)
        g_kernel = grad_k(params0)
        g_auto = jax.grad(
            lambda p: jnp.sum(model.log_lik(p, phi, y) + model.log_prior(p))
        )(params0)
        # bf16 likelihood path: compare in relative Frobenius norm (per-
        # element rtol is meaningless on near-zero gradient entries)
        for a, b in ((g_kernel.w, g_auto.w), (g_kernel.U, g_auto.U)):
            rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))
            assert rel < 2e-2, rel


def test_gmc_pallas_grad_backend_samples(key):
    """run_gmc_chains(grad_backend='pallas') runs, accepts, and agrees with
    the XLA-gradient runner statistically (bf16 gradients perturb the
    trajectory, never the MH accept ratio)."""
    from gpt_tpu.inference.gmc import GMCConfig, run_gmc_chains

    model, params0, phi, y, ks = _setup(key, C=4)
    cfg = GMCConfig(eps=TensorGPParams(w=1e-4, U=1e-6), num_leapfrog=3)
    _, coll_p, acc_p = run_gmc_chains(
        model, params0, ks, phi, y, config=cfg, burnin=5, maxepoch=10,
        grad_backend="pallas",
    )
    _, coll_x, acc_x = run_gmc_chains(
        model, params0, ks, phi, y, config=cfg, burnin=5, maxepoch=10,
        grad_backend="xla",
    )
    assert float(acc_p.mean()) > 0.3
    assert abs(float(acc_p.mean()) - float(acc_x.mean())) < 0.3
    assert bool(jnp.all(jnp.isfinite(coll_p.w)))


def test_megafused_classification_matches_fused_xla(key):
    """Softmax classification in-kernel: (chain, class) super-chains with
    the class-group softmax residual ≡ the XLA classifier path
    (langevin=False; VERDICT r3 ask #6's classification leg).

    Per-chain rejection granularity differs (the kernel rejects per
    (chain, class) pair, the XLA path per chain) — irrelevant here since a
    healthy run rejects nothing."""
    from gpt_tpu.inference.sgld import run_sgld
    from gpt_tpu.models.classification import TensorClassParams, TensorGPClassifier

    kI, kphi, ky, kp, ks = jax.random.split(key, 5)
    n, r, D, Q, ncls, N, C = 12, 3, 3, 10, 4, 36, 2
    I = sample_core_indices(kI, r, D, Q)
    phi = jax.random.normal(kphi, (N, D, n), jnp.float32) * 0.3
    y = jax.random.randint(ky, (N,), 0, ncls).astype(jnp.float32)
    model = TensorGPClassifier(n=n, r=r, D=D, num_classes=ncls, I=I)
    params0 = jax.vmap(model.init_params)(jax.random.split(kp, C))
    config = SGLDConfig(
        eps=TensorClassParams(w=1e-3, U=1e-5), transport="polar",
        langevin=False
    )

    mf_final, _, rej = run_sgld_megafused(
        model, params0, ks, phi, y, m=12, config=config, burnin=3,
        maxepoch=0, collect_fn=lambda p: (), chain_block=2 * ncls,
        data_chunk=6,
    )
    xla_final, _ = run_sgld_chains_fused(
        model, params0, ks, phi, y, m=12, config=config, burnin=3,
        maxepoch=0, collect_fn=lambda p: (),
    )
    assert int(rej) == 0
    assert mf_final.w.shape == (C, ncls, Q)
    np.testing.assert_allclose(
        np.asarray(mf_final.w), np.asarray(xla_final.params.w),
        rtol=5e-3, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(mf_final.U), np.asarray(xla_final.params.U),
        rtol=5e-3, atol=5e-5,
    )


def test_megafused_classification_euclidean_r_gt_n(key):
    """The reference's literal ImageExperiment shape (r > n) runs megafused
    with Euclidean factors and trains (error decreases on separable data)."""
    from gpt_tpu.models.classification import TensorGPClassifier

    kI, kphi, kp, ks = jax.random.split(key, 4)
    n, r, D, Q, ncls, N, C = 4, 6, 2, 8, 3, 48, 2
    I = sample_core_indices(kI, r, D, Q)
    phi = jax.random.normal(kphi, (N, D, n), jnp.float32) * 0.5
    # separable-ish labels from a random reference model
    ref = TensorGPClassifier(n=n, r=r, D=D, num_classes=ncls, I=I,
                             stiefel=False)
    truth = ref.init_params(jax.random.PRNGKey(77))
    y = jnp.argmax(ref.logits(truth, phi), axis=-1).astype(jnp.float32)
    from gpt_tpu.models.classification import TensorClassParams as _TCP

    params0 = jax.vmap(ref.init_params)(jax.random.split(kp, C))
    config = SGLDConfig(
        eps=_TCP(w=5e-3, U=5e-4), transport="polar", langevin=False
    )
    final, _, rej = run_sgld_megafused(
        ref, params0, ks, phi, y, m=16, config=config, burnin=60,
        maxepoch=0, collect_fn=lambda p: (), chain_block=ncls, data_chunk=8,
    )
    assert int(rej) == 0
    err0 = float(jnp.mean(
        jnp.argmax(ref.logits(params0, phi), axis=-1) != y[None].astype(jnp.int32)))
    err1 = float(jnp.mean(
        jnp.argmax(ref.logits(final, phi), axis=-1) != y[None].astype(jnp.int32)))
    assert err1 < err0, (err0, err1)
