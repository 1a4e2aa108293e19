"""NUTS validation: exact conjugate posteriors, independent-engine agreement,
and efficiency vs fixed-L HMC.

The reference's NUTS layer is external (CmdStan `StanFullTheta.jl:6-51`,
rstan `california/fulltheta.r`, Mamba `ImageExperiment.jl:223-283`); these
tests hold the in-framework engine to the same standard the reference's
rstan reports use (posterior moments + Rhat/ESS).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_tpu.inference import NUTSConfig, run_nuts
from gpt_tpu.inference.nuts import _ctz


def test_ctz_bit_trick():
    vals = jnp.asarray([1, 2, 3, 4, 6, 8, 12, 96], jnp.int32)
    out = jax.vmap(_ctz)(vals)
    np.testing.assert_array_equal(np.asarray(out), [0, 1, 0, 2, 1, 3, 2, 5])


def test_nuts_correlated_gaussian_moments(key):
    """NUTS must recover mean/cov of a correlated Gaussian within MC error."""
    dim = 4
    A = jax.random.normal(jax.random.PRNGKey(3), (dim, dim))
    cov = A @ A.T + 0.5 * jnp.eye(dim)
    prec = jnp.linalg.inv(cov)
    mu = jnp.asarray([1.0, -2.0, 0.5, 3.0])

    def logp(x):
        d = x - mu
        return -0.5 * d @ prec @ d

    samples, stats, eps = run_nuts(
        logp, jnp.zeros(dim), key,
        num_warmup=300, num_samples=1500,
        config=NUTSConfig(max_depth=8, init_step_size=0.2),
    )
    S = np.asarray(samples)
    assert np.all(np.isfinite(S))
    assert float(np.mean(np.asarray(stats["diverged"]))) < 0.01
    acc = float(np.mean(np.asarray(stats["accept_stat"])))
    assert 0.6 < acc <= 1.0, acc
    err_mu = np.max(np.abs(S.mean(0) - np.asarray(mu)))
    assert err_mu < 0.35, err_mu
    err_cov = np.max(np.abs(np.cov(S.T) - np.asarray(cov)))
    assert err_cov < 0.2 * float(jnp.max(jnp.abs(cov))), err_cov


def test_nuts_matches_conjugate_blr_posterior(key):
    """Bayesian linear regression in RFF space (the full-theta model,
    GPT_SGLD.jl:809-847): NUTS vs the exact Gaussian posterior."""
    kx, kn, kt = jax.random.split(key, 3)
    N, n = 60, 5
    phi = jax.random.normal(kx, (N, n)) / jnp.sqrt(n)
    theta_true = jnp.arange(1.0, n + 1.0)
    sv, st2 = 0.05, 1.0
    y = phi @ theta_true + jnp.sqrt(sv) * jax.random.normal(kn, (N,))

    prec_post = phi.T @ phi / sv + jnp.eye(n) / st2
    cov_post = jnp.linalg.inv(prec_post)
    mu_post = cov_post @ (phi.T @ y) / sv

    def logp(th):
        r = y - phi @ th
        return -0.5 * jnp.dot(r, r) / sv - 0.5 * jnp.dot(th, th) / st2

    samples, stats, _ = run_nuts(
        logp, jnp.zeros(n), kt, num_warmup=300, num_samples=1200,
        config=NUTSConfig(max_depth=8, init_step_size=0.1),
    )
    S = np.asarray(samples)
    sd = np.sqrt(np.diag(np.asarray(cov_post)))
    # posterior mean within 4 MC standard errors per coordinate
    mc_se = sd / np.sqrt(200.0)  # conservative ESS estimate
    assert np.all(np.abs(S.mean(0) - np.asarray(mu_post)) < 4 * mc_se + 0.05)
    # marginal sds within 20%
    assert np.all(np.abs(S.std(0) / sd - 1.0) < 0.25)


def test_nuts_pytree_positions(key):
    """Pytree positions ravel/unravel transparently."""
    def logp(p):
        return -0.5 * jnp.sum(p["a"] ** 2) - 0.5 * jnp.sum((p["b"] - 1.0) ** 2)

    pos0 = {"a": jnp.zeros((2, 3)), "b": jnp.zeros(4)}
    samples, stats, _ = run_nuts(
        logp, pos0, key, num_warmup=100, num_samples=300,
        config=NUTSConfig(max_depth=6),
    )
    assert samples["a"].shape == (300, 2, 3)
    b_mean = np.asarray(samples["b"]).mean(0)
    assert np.all(np.abs(b_mean - 1.0) < 0.3)


def test_nuts_beats_fixed_hmc_ess_per_grad(key):
    """On a badly-scaled Gaussian, NUTS's adaptive trajectories must give at
    least the ESS-per-gradient of a deliberately mis-lengthed fixed-L HMC —
    the reason the reference reached for NUTS engines."""
    from gpt_tpu.diagnostics.mcmc import effective_sample_size
    from gpt_tpu.inference import HMCConfig, run_adaptive_hmc

    scales = jnp.asarray([1.0, 0.1, 0.05, 10.0])

    def logp(x):
        return -0.5 * jnp.sum((x / scales) ** 2)

    k1, k2 = jax.random.split(key)
    ns, nw = 800, 300
    samples_n, stats_n, _ = run_nuts(
        logp, jnp.zeros(4), k1, num_warmup=nw, num_samples=ns,
        config=NUTSConfig(max_depth=9),
    )
    grads_n = float(np.sum(np.asarray(stats_n["n_leapfrog"])))

    def min_ess(S):
        # chains axis first: single chain -> split in two for the estimator
        S = np.asarray(S)
        halves = np.stack([S[: len(S) // 2], S[len(S) // 2 :]])
        return float(np.min(np.asarray(effective_sample_size(halves))))

    ess_n = min_ess(samples_n)
    eff_n = ess_n / grads_n
    # measured on this target/seed: NUTS ess 72 @ 83 lf/draw (0.00109/grad);
    # HMC L=10: ess 3.6 (0.00045/grad), matched-budget L=83: ess 59 (0.00089)
    for L in [10, int(round(grads_n / ns))]:
        samples_h, _, _ = run_adaptive_hmc(
            logp, jnp.zeros(4), k2, num_warmup=nw, num_samples=ns,
            config=HMCConfig(num_leapfrog=L, jitter_steps=False),
        )
        eff_h = min_ess(samples_h) / (ns * L)
        print(f"NUTS ess/grad {eff_n:.5f} (ess {ess_n:.0f}) vs HMC L={L} {eff_h:.5f}")
        assert eff_n > eff_h, (L, eff_n, eff_h)
    assert ess_n > 30, ess_n  # and the ESS is actually usable


def test_nuts_em_estep(key):
    """NUTS as the stochastic-EM E-step engine (ImageExperiment.jl:223-283)."""
    from gpt_tpu.inference import StochasticEMConfig, stochastic_em

    kx, kn = jax.random.split(key)
    N, n = 40, 3
    phi = jax.random.normal(kx, (N, n)) / jnp.sqrt(n)
    theta_true = jnp.asarray([1.0, -1.0, 2.0])
    y = phi @ theta_true + 0.1 * jax.random.normal(kn, (N,))

    def neg_log_joint(theta, h):
        sv = h[0]
        r = y - phi @ theta
        return (
            0.5 * jnp.dot(r, r) / sv
            + 0.5 * N * jnp.log(sv)
            + 0.5 * jnp.dot(theta, theta)
        )

    theta, h, rounds, _ = stochastic_em(
        jax.random.PRNGKey(5), jnp.zeros(n), jnp.asarray([1.0]),
        neg_log_joint=neg_log_joint,
        config=StochasticEMConfig(
            e_engine="nuts", e_steps=20, e_hmc_warmup=10, max_rounds=60,
        ),
    )
    assert bool(jnp.all(jnp.isfinite(theta)))
    assert float(h[0]) < 0.3  # noise variance pulled toward the 0.01 regime
    assert float(jnp.max(jnp.abs(theta - theta_true))) < 0.5
