"""R-hat / ESS diagnostics tests against known sampling distributions."""
import jax
import jax.numpy as jnp
import numpy as np

from gpt_tpu.diagnostics import effective_sample_size, potential_scale_reduction, summarize_chains


def _ar1(key, chains, T, rho):
    innov = jax.random.normal(key, (chains, T))

    def step(c, e):
        x = rho * c + jnp.sqrt(1 - rho**2) * e
        return x, x

    _, xs = jax.lax.scan(step, jnp.zeros(chains), innov.T)
    return xs.T  # (chains, T)


def test_rhat_iid_near_one(key):
    x = jax.random.normal(key, (4, 1000))
    r = float(potential_scale_reduction(x))
    assert abs(r - 1.0) < 0.02, r


def test_rhat_detects_nonconvergence(key):
    x = jax.random.normal(key, (4, 1000))
    x = x.at[0].add(3.0)  # one chain in a different mode
    assert float(potential_scale_reduction(x)) > 1.5


def test_rhat_detects_trend(key):
    x = jax.random.normal(key, (4, 1000)) + jnp.linspace(0, 3, 1000)[None, :]
    assert float(potential_scale_reduction(x)) > 1.2  # split-R̂ catches drift


def test_ess_iid(key):
    C, T = 4, 2000
    x = jax.random.normal(key, (C, T))
    ess = float(effective_sample_size(x))
    assert 0.5 * C * T < ess < 1.5 * C * T, ess


def test_ess_ar1_matches_theory(key):
    C, T, rho = 4, 4000, 0.9
    x = _ar1(key, C, T, rho)
    ess = float(effective_sample_size(x))
    theory = C * T * (1 - rho) / (1 + rho)  # ≈ 842
    assert 0.5 * theory < ess < 2.0 * theory, (ess, theory)


def test_summarize_batched(key):
    x = jax.random.normal(key, (4, 500, 3))  # 3 params
    s = summarize_chains(x)
    assert s["rhat"].shape == (3,)
    assert s["ess"].shape == (3,)
    np.testing.assert_allclose(s["mean"], np.zeros(3), atol=0.1)
