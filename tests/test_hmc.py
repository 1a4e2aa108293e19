"""Adaptive-HMC tests: exact posterior moments on conjugate targets."""
import jax
import jax.numpy as jnp
import numpy as np

from gpt_tpu.diagnostics import effective_sample_size, potential_scale_reduction
from gpt_tpu.inference.hmc import HMCConfig, run_adaptive_hmc


def test_hmc_standard_normal_moments(key):
    def logp(q):
        return -0.5 * jnp.sum(q["x"] ** 2)

    samples, accs, eps = run_adaptive_hmc(
        logp, {"x": jnp.zeros(5)}, key, num_warmup=300, num_samples=1500,
        config=HMCConfig(num_leapfrog=8),
    )
    x = samples["x"]
    assert 0.6 < float(jnp.mean(jnp.minimum(accs, 1))) <= 1.0
    np.testing.assert_allclose(jnp.mean(x, 0), np.zeros(5), atol=0.15)
    np.testing.assert_allclose(jnp.std(x, 0), np.ones(5), atol=0.15)


def test_hmc_adapts_step_size_to_scale(key):
    """Narrow target → adapted ε shrinks below init."""
    def logp(q):
        return -0.5 * jnp.sum((q / 0.01) ** 2)

    _, accs, eps = run_adaptive_hmc(
        logp, jnp.zeros(3), key, num_warmup=400, num_samples=200,
        config=HMCConfig(num_leapfrog=8, init_step_size=0.5),
    )
    assert float(eps) < 0.1
    assert float(jnp.mean(jnp.minimum(accs, 1))) > 0.5


def test_hmc_bayesian_linreg_matches_conjugate(key):
    """Posterior mean/cov of Gaussian linear regression vs closed form —
    the full-theta Stan workload (StanFullTheta.jl) in miniature."""
    kx, ky, kh = jax.random.split(key, 3)
    N, n = 40, 4
    phi = jax.random.normal(kx, (N, n))
    theta_true = jnp.array([1.0, -2.0, 0.5, 0.0])
    sv = 0.25
    y = phi @ theta_true + jnp.sqrt(sv) * jax.random.normal(ky, (N,))

    def logp(theta):
        return -0.5 * jnp.sum((y - phi @ theta) ** 2) / sv - 0.5 * jnp.sum(theta**2)

    prec = phi.T @ phi / sv + jnp.eye(n)
    mu = jnp.linalg.solve(prec, phi.T @ y / sv)

    samples, accs, _ = run_adaptive_hmc(
        logp, jnp.zeros(n), kh, num_warmup=500, num_samples=3000,
        config=HMCConfig(num_leapfrog=12),
    )
    np.testing.assert_allclose(jnp.mean(samples, 0), mu, atol=0.08)
    emp_cov = jnp.cov(samples.T)
    np.testing.assert_allclose(emp_cov, jnp.linalg.inv(prec), atol=0.05)


def test_hmc_chains_vmap_and_diagnostics(key):
    def logp(q):
        return -0.5 * jnp.sum(q**2)

    keys = jax.random.split(key, 4)
    run = lambda k: run_adaptive_hmc(
        logp, jnp.zeros(2), k, num_warmup=200, num_samples=500,
        config=HMCConfig(num_leapfrog=8),
    )[0]
    chains = jax.vmap(run)(keys)  # (4, 500, 2)
    rhat = potential_scale_reduction(chains)
    ess = effective_sample_size(chains)
    assert float(jnp.max(rhat)) < 1.05
    assert float(jnp.min(ess)) > 200
