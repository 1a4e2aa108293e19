"""TP (feature-axis) sharded full-theta SGLD: equivalence + posterior tests.

Covers the reference's n=8000–16000 no-tensor scaling intent
(``kin40kNoTensorExperiment.jl:34-46``) — VERDICT r1 item 8.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_tpu.inference.sgld import SGLDConfig, run_sgld
from gpt_tpu.models.fulltheta import FullThetaGP, FullThetaParams
from gpt_tpu.parallel import make_feature_mesh, run_sgld_tp


def _problem(key, N=48, n=64, sig=0.05):
    kx, kt, ke = jax.random.split(key, 3)
    phi = jax.random.normal(kx, (N, n)) / jnp.sqrt(n)
    theta_true = jax.random.normal(kt, (n,))
    y = phi @ theta_true + jnp.sqrt(sig) * jax.random.normal(ke, (N,))
    return phi, y


def test_tp_sharded_matches_unsharded_sgd(key):
    """Full-batch SGD (noise off): 8-shard TP == 1-shard TP == run_sgld."""
    phi, y = _problem(key)
    model = FullThetaGP(n=64, signal_var=0.05, sigma_theta=1.0)
    config = SGLDConfig(eps=1e-2, langevin=False, decay=0.3)

    mesh8 = make_feature_mesh(8)
    mesh1 = make_feature_mesh(1)
    th8, col8, rej8 = run_sgld_tp(
        model, mesh8, key, phi, y, m=48, config=config, burnin=2, maxepoch=5
    )
    th1, col1, rej1 = run_sgld_tp(
        model, mesh1, key, phi, y, m=48, config=config, burnin=2, maxepoch=5
    )
    # psum vs single-device sum: reduction order differs → float-level noise
    np.testing.assert_allclose(np.asarray(th8), np.asarray(th1), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(col8), np.asarray(col1), rtol=1e-6, atol=1e-7)
    assert int(rej8) == int(rej1) == 0

    # against the generic (unsharded) engine: same init (the TP runner draws
    # theta0 from split(key,3)[0]), full batch so the permutation is moot
    kinit = jax.random.split(key, 3)[0]
    theta0 = FullThetaParams(theta=1.0 * jax.random.normal(kinit, (64,)))
    final, collected = run_sgld(
        model, theta0, key, phi, y, m=48, config=config, burnin=2, maxepoch=5
    )
    np.testing.assert_allclose(
        np.asarray(th8), np.asarray(final.params.theta), rtol=1e-6, atol=1e-7
    )


def test_tp_feature_padding(key):
    """n not divisible by the mesh: padded coords must not change the fit."""
    phi, y = _problem(key, n=60)
    model = FullThetaGP(n=60, signal_var=0.05, sigma_theta=1.0)
    config = SGLDConfig(eps=1e-2, langevin=False)
    mesh8 = make_feature_mesh(8)
    th8, col8, _ = run_sgld_tp(
        model, mesh8, key, phi, y, m=24, config=config, burnin=1, maxepoch=3
    )
    assert th8.shape == (60,)
    assert col8.shape == (3, 60)
    assert bool(jnp.all(jnp.isfinite(th8)))


def test_tp_sgld_posterior_moments(key):
    """Langevin on: the sharded chain targets the exact conjugate posterior."""
    N, n, sig = 256, 16, 0.1
    phi, y = _problem(key, N=N, n=n, sig=sig)
    model = FullThetaGP(n=n, signal_var=sig, sigma_theta=1.0)
    prec = phi.T @ phi / sig + jnp.eye(n)
    mean_exact = jnp.linalg.solve(prec, phi.T @ y / sig)

    mesh = make_feature_mesh(8)
    config = SGLDConfig(eps=2e-3, langevin=True)
    _, collected, rej = run_sgld_tp(
        model, mesh, key, phi, y, m=N, config=config, burnin=300, maxepoch=1200
    )
    assert int(rej) == 0
    mean_mc = jnp.mean(collected, axis=0)
    sd_exact = jnp.sqrt(jnp.diagonal(jnp.linalg.inv(prec)))
    # posterior mean within a fraction of the posterior sd per coordinate
    err = jnp.abs(mean_mc - mean_exact) / sd_exact
    assert float(jnp.max(err)) < 0.75, float(jnp.max(err))


def test_tp_nan_rejection_is_global(key):
    """A NaN reaching any shard rolls back the global step on every shard."""
    phi, y = _problem(key)
    phi = phi.at[0, 63].set(jnp.nan)  # column owned by the last shard
    model = FullThetaGP(n=64, signal_var=0.05, sigma_theta=1.0)
    config = SGLDConfig(eps=1e-2, langevin=False)
    mesh = make_feature_mesh(8)
    th, col, rej = run_sgld_tp(
        model, mesh, key, phi, y, m=48, config=config, burnin=0, maxepoch=4
    )
    kinit = jax.random.split(key, 3)[0]
    theta0 = 1.0 * jax.random.normal(kinit, (64,))
    # every step contains the poisoned datum (full batch) → all rejected
    assert int(rej) == 4
    np.testing.assert_allclose(np.asarray(th), np.asarray(theta0), rtol=0, atol=0)


def test_tp_chains_mesh_invariance():
    """(chain, feature) composed runner: (2, 4) mesh == (1, 1) mesh (i.e.
    fully local) to collective-order tolerance — 8 chains, feature-sharded
    theta (kin40kNoTensorExperiment.jl:34-46 composed with its seed sweeps)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpt_tpu.inference.sgld import SGLDConfig
    from gpt_tpu.models.fulltheta import FullThetaGP
    from gpt_tpu.parallel import make_chain_feature_mesh, run_sgld_tp_chains

    key = jax.random.PRNGKey(4)
    kphi, ky, kr = jax.random.split(key, 3)
    n, N, C = 96, 64, 8
    ft = FullThetaGP(n=n, signal_var=0.05, sigma_theta=1.0)
    phi = jax.random.normal(kphi, (N, n), jnp.float32) / jnp.sqrt(n)
    y = jax.random.normal(ky, (N,), jnp.float32)
    cfg = SGLDConfig(eps=1e-3)

    out = {}
    for shape in [(1, 1), (2, 4)]:
        mesh = make_chain_feature_mesh(*shape)
        theta, coll, rej = run_sgld_tp_chains(
            ft, mesh, kr, phi, y, num_chains=C, m=16, config=cfg,
            burnin=1, maxepoch=3,
        )
        assert theta.shape == (C, n)
        assert coll.shape == (C, 3, n)
        assert int(jnp.sum(rej)) == 0
        out[shape] = np.asarray(jax.device_get(theta))
    err = float(np.max(np.abs(out[(1, 1)] - out[(2, 4)])))
    assert err < 1e-4, err


def test_tp_rmsprop_runs():
    """RMSprop TP (previously NotImplementedError): trains, stays finite, and
    differs from the plain-SGLD trajectory (the preconditioner engages)."""
    import jax
    import jax.numpy as jnp

    from gpt_tpu.inference.sgld import SGLDConfig
    from gpt_tpu.models.fulltheta import FullThetaGP
    from gpt_tpu.parallel import make_feature_mesh, run_sgld_tp

    key = jax.random.PRNGKey(6)
    kphi, ky, kr = jax.random.split(key, 3)
    n, N = 64, 48
    ft = FullThetaGP(n=n, signal_var=0.05, sigma_theta=1.0)
    phi = jax.random.normal(kphi, (N, n), jnp.float32) / jnp.sqrt(n)
    y = jax.random.normal(ky, (N,), jnp.float32)
    mesh = make_feature_mesh(8)

    theta_rms, _, rej = run_sgld_tp(
        ft, mesh, kr, phi, y, m=16,
        config=SGLDConfig(eps=1e-3, rmsprop=True), burnin=1, maxepoch=2,
    )
    theta_plain, _, _ = run_sgld_tp(
        ft, mesh, kr, phi, y, m=16,
        config=SGLDConfig(eps=1e-3), burnin=1, maxepoch=2,
    )
    assert int(rej) == 0
    assert bool(jnp.all(jnp.isfinite(theta_rms)))
    assert float(jnp.max(jnp.abs(theta_rms - theta_plain))) > 1e-4
