"""Gibbs sampler + hyperparameter-learning tests.

Gibbs correctness is checked against the exact conjugate posterior in the
fixed-U case and by posterior recovery; NLML implementations are checked
against each other (Woodbury form vs direct form — the reference validates
the same identity at ``GPT_SGLD.jl:925-932``) and the optimiser against a
known optimum.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_tpu.data.synth import make_tensor_synth
from gpt_tpu.features import full_features, sample_full_rff
from gpt_tpu.inference import (
    GibbsConfig,
    gibbs_sweep,
    gp_nlml,
    init_gibbs_params,
    optimize_hyperparams,
    rff_nlml,
    run_gibbs,
    stochastic_em,
)
from gpt_tpu.inference.gibbs import _mvn_from_precision
from gpt_tpu.utils.math import rmse


@pytest.fixture(scope="module")
def synth():
    return make_tensor_synth(jax.random.PRNGKey(0), N=120, D=3, n=4, r=2, Q=8)


def test_mvn_from_precision_moments(key):
    prec = jnp.array([[2.0, 0.5], [0.5, 1.0]])
    rhs = jnp.array([1.0, -1.0])
    draws = jax.vmap(lambda k: _mvn_from_precision(k, prec, rhs))(
        jax.random.split(key, 20000)
    )
    mu = jnp.linalg.solve(prec, rhs)
    cov = jnp.linalg.inv(prec)
    np.testing.assert_allclose(draws.mean(0), mu, atol=0.03)
    np.testing.assert_allclose(jnp.cov(draws.T), cov, atol=0.05)


def test_gibbs_w_conditional_matches_ridge(synth):
    """With U fixed at truth, E[w | U, y] is the ridge solution; a long chain
    of w-draws (single sweep keeps U random-walking, so check the conditional
    directly via the sweep's first stage on a model with D·n·r tiny)."""
    model, phi = synth.model, synth.phi
    y = synth.y[0.01]
    cfg = GibbsConfig(sigma_w=1.0, sigma_u=1.0)
    params = synth.params
    draws = jax.vmap(
        lambda k: gibbs_sweep(model, params, k, phi, y, cfg).w
    )(jax.random.split(jax.random.PRNGKey(1), 400))
    from gpt_tpu.ops.contraction import phidot, core_products

    V = core_products(phidot(phi, params.U), model.I)  # (N, Q)
    prec = V.T @ V / model.signal_var + jnp.eye(model.Q)
    mu = jnp.linalg.solve(prec, V.T @ y / model.signal_var)
    np.testing.assert_allclose(draws.mean(0), mu, atol=0.1)


def test_gibbs_recovers_signal(synth):
    y = synth.y[0.1]
    params0 = init_gibbs_params(synth.model, jax.random.PRNGKey(2))
    final, collected = run_gibbs(
        synth.model, params0, jax.random.PRNGKey(3), synth.phi, y,
        num_iterations=60, burnin=20,
    )
    preds = jax.vmap(lambda p: synth.model.predict(p, synth.phi))(collected)
    post = float(rmse(preds.mean(0), y))
    prior = float(rmse(jnp.zeros_like(y), y))
    assert post < 0.5 * prior, (post, prior)


def test_rff_nlml_matches_direct_nxn(key):
    """Woodbury n×n form equals the direct N×N Gaussian marginal."""
    kx, kf, ky = jax.random.split(key, 3)
    N, n, D = 30, 12, 2
    X = jax.random.normal(kx, (N, D))
    phi = full_features(X, sample_full_rff(kf, n, D), 1.0, 1.3)
    y = jax.random.normal(ky, (N,))
    sv = 0.3
    direct_cov = phi @ phi.T + sv * jnp.eye(N)
    Ld = jnp.linalg.cholesky(direct_cov)
    direct = (
        jnp.sum(jnp.log(jnp.diag(Ld)))
        + 0.5 * y @ jax.scipy.linalg.cho_solve((Ld, True), y)
        + 0.5 * N * jnp.log(2 * jnp.pi)
    )
    np.testing.assert_allclose(float(rff_nlml(phi, y, sv)), float(direct), rtol=1e-6)


def test_gp_nlml_differentiable_and_sane(key):
    kx, ky = jax.random.split(key)
    X = jax.random.normal(kx, (25, 3))
    y = jnp.sin(X[:, 0]) + 0.1 * jax.random.normal(ky, (25,))
    val = gp_nlml(X, y, 0.1, 1.0, jnp.ones(3))
    assert jnp.isfinite(val)
    g = jax.grad(lambda sv: gp_nlml(X, y, sv, 1.0, jnp.ones(3)))(0.1)
    assert jnp.isfinite(g)


def test_optimize_hyperparams_finds_noise_level(key):
    """Optimising (σ², σ_RBF², ℓ) of the exact GP on GP-drawn data recovers
    hyperparameters with higher marginal likelihood than the init."""
    kx, kf = jax.random.split(key)
    X = jax.random.normal(kx, (60, 1))
    from gpt_tpu.inference import se_ard_kernel

    K = se_ard_kernel(X, X, 0.7, 1.5) + 0.05 * jnp.eye(60)
    y = jnp.linalg.cholesky(K) @ jax.random.normal(kf, (60,))

    def nlml(h):
        return gp_nlml(X, y, h[0], h[1], h[2:])

    init = jnp.array([0.5, 0.5, 2.0])
    res = optimize_hyperparams(nlml, init, max_steps=80)
    assert float(res.nlml) < float(nlml(init)) - 1.0
    assert res.hyperparams[0] < 0.3  # noise var pulled toward 0.05


def test_stochastic_em_gaussian_sanity(key):
    """EM on a conjugate Gaussian toy: hyperparam (noise var) moves toward
    the truth and the loop terminates."""
    kx, kn, ke = jax.random.split(key, 3)
    N, n = 80, 10
    phi = jax.random.normal(kx, (N, n)) / jnp.sqrt(n)
    theta_true = jax.random.normal(kn, (n,)) * 2
    y = phi @ theta_true + 0.3 * jax.random.normal(ke, (N,))

    def neg_log_joint(theta, h):
        sv = h[0]
        resid = y - phi @ theta
        return (
            0.5 * jnp.sum(resid**2) / sv
            + 0.5 * N * jnp.log(sv)
            + 0.5 * jnp.sum(theta**2)
        )

    from gpt_tpu.inference import StochasticEMConfig

    theta, h, rounds, converged = stochastic_em(
        jax.random.PRNGKey(5),
        jnp.zeros(n),
        jnp.array([5.0]),
        neg_log_joint=neg_log_joint,
        config=StochasticEMConfig(e_steps=100, eps_theta=1e-2, max_rounds=100),
    )
    assert h[0] < 1.0, h  # moved strongly toward 0.09 from 5.0
    assert int(rounds) > 0


def test_stochastic_em_hmc_estep(key):
    """The HMC E-step (the Mamba-NUTS capability, ImageExperiment.jl:223-283)
    reaches the same hyperparameter answer as the SGLD E-step."""
    kx, kn, ke = jax.random.split(key, 3)
    N, n = 80, 10
    phi = jax.random.normal(kx, (N, n)) / jnp.sqrt(n)
    theta_true = jax.random.normal(kn, (n,)) * 2
    y = phi @ theta_true + 0.3 * jax.random.normal(ke, (N,))

    def neg_log_joint(theta, h):
        sv = h[0]
        resid = y - phi @ theta
        return (
            0.5 * jnp.sum(resid**2) / sv
            + 0.5 * N * jnp.log(sv)
            + 0.5 * jnp.sum(theta**2)
        )

    from gpt_tpu.inference import StochasticEMConfig

    theta, h, rounds, converged = stochastic_em(
        jax.random.PRNGKey(5),
        jnp.zeros(n),
        jnp.array([5.0]),
        neg_log_joint=neg_log_joint,
        config=StochasticEMConfig(
            e_engine="hmc", e_steps=20, e_hmc_warmup=10, e_hmc_leapfrog=8,
            max_rounds=60,
        ),
    )
    assert bool(jnp.all(jnp.isfinite(theta)))
    assert h[0] < 1.0, h  # same basin as the SGLD E-step
    assert int(rounds) > 0


def test_columnwise_gibbs_recovers(synth):
    """inf.R::GPT_infcol variant: n-dim column draws recover the signal too."""
    y = synth.y[0.1]
    params0 = init_gibbs_params(synth.model, jax.random.PRNGKey(2))
    final, collected = run_gibbs(
        synth.model, params0, jax.random.PRNGKey(3), synth.phi, y,
        num_iterations=60, burnin=20, columnwise=True,
    )
    preds = jax.vmap(lambda p: synth.model.predict(p, synth.phi))(collected)
    post = float(rmse(preds.mean(0), y))
    prior = float(rmse(jnp.zeros_like(y), y))
    assert post < 0.5 * prior, (post, prior)


def test_multirestart_finds_sharp_basin(key):
    """Box-constrained multi-restart (the PP-optimum recovery machinery,
    RECORDS `pp_hyperlearning_exact_basin`: NLML -2239.26 vs reference
    -2239.2) escapes the smooth basin a flat single start gets stuck in.

    Synthetic analog of the reference's sharp PP basin
    (`DataRecords.txt:837-840`: recovered ls2 = 0.0028): one ARD dimension
    carries fast variation (true ls = 0.05) that a flat ls = 1 init explains
    away as noise.
    """
    import jax
    import jax.numpy as jnp

    from gpt_tpu.inference import gp_nlml, optimize_hyperparams
    from gpt_tpu.inference.hyper import optimize_hyperparams_restarts

    kx, kf, kn = jax.random.split(key, 3)
    N, D = 120, 2
    X = jax.random.uniform(kx, (N, D), jnp.float64)
    true_ls = jnp.asarray([1.0, 0.02], jnp.float64)
    from gpt_tpu.inference import se_ard_kernel

    K = se_ard_kernel(X, X, true_ls, 1.0) + 1e-4 * jnp.eye(N)
    y = jnp.linalg.cholesky(K) @ jax.random.normal(kf, (N,), jnp.float64)

    def nlml(h):
        return gp_nlml(X, y, h[0], h[1], h[2:])

    # deceptive init: moderate noise + a long ls on the fast dimension makes
    # the smooth explain-it-as-noise basin the local attractor (measured:
    # single start lands at NLML +147 / ls2 = 0.48 / noise 0.6)
    init = jnp.asarray([0.5, 1.0, 1.0, 5.0], jnp.float64)
    flat = optimize_hyperparams(nlml, init, max_steps=60, log_bounds=(-8.0, 5.0))
    multi = optimize_hyperparams_restarts(
        nlml, init, key, num_random=2, sharp_value=0.03, max_steps=60
    )
    # the sharp restart must find the fast dimension and beat the flat start
    assert float(multi.nlml) < float(flat.nlml) - 10.0
    assert float(jnp.min(multi.hyperparams[2:])) < 0.15
    # recovered noise must be small (flat basin absorbs signal into noise)
    assert float(multi.hyperparams[0]) < 0.05
