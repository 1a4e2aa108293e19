"""Variational-inference tests: second-moment correctness vs Monte Carlo,
fit quality vs the Gibbs posterior on the same problem."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_tpu.data.synth import make_tensor_synth
from gpt_tpu.inference.vi import VIConfig, _second_moment, _tables, init_vi, run_vi, vi_step
from gpt_tpu.utils.math import rmse


def test_second_moment_matches_monte_carlo(key):
    """E_q[V_q V_q'] from the closed form vs sampling U ~ q."""
    n, r, D, Q, N = 3, 2, 2, 4, 5
    k1, k2, k3 = jax.random.split(key, 3)
    phi = jax.random.normal(k1, (N, D, n))
    I = jax.random.randint(k2, (Q, D), 0, r)
    mu_U = jax.random.normal(k3, (D, n, r)) * 0.5
    # random SPD covariances
    A = jax.random.normal(jax.random.fold_in(key, 7), (D, r, n, n)) * 0.3
    sigma_U = jnp.einsum("dlnm,dlkm->dlnk", A, A) + 0.1 * jnp.eye(n)

    G, S = _tables(phi, mu_U, sigma_U, I)
    M2, _ = _second_moment(G, S, I)

    # Monte Carlo over q(U): columns independent N(mu, Sigma)
    L = jnp.linalg.cholesky(sigma_U)
    def draw(k):
        z = jax.random.normal(k, (D, r, n))
        cols = mu_U.transpose(0, 2, 1) + jnp.einsum("dlnm,dlm->dln", L, z)  # (D, r, n)
        U = cols.transpose(0, 2, 1)  # (D, n, r)
        mdot = jnp.einsum("idn,dnl->idl", phi, U)
        idx = jnp.broadcast_to(I.T.astype(jnp.int32), mdot.shape[:-1] + (Q,))
        g = jnp.take_along_axis(mdot, idx, axis=-1)
        V = jnp.prod(g, axis=1)  # (N, Q)
        return V[:, :, None] * V[:, None, :]

    draws = jax.vmap(draw)(jax.random.split(key, 6000))
    mc = draws.mean(0)
    np.testing.assert_allclose(M2, mc, rtol=0.25, atol=0.05)


def test_vi_fits_synthetic_data():
    s = make_tensor_synth(jax.random.PRNGKey(0), N=80, D=2, n=4, r=2, Q=4)
    y = s.y[0.1]
    state = run_vi(
        jax.random.PRNGKey(1), s.phi, y, s.I, 0.01, num_iterations=10,
    )
    fit = float(rmse(state.elbo_fit, y))
    zero = float(rmse(jnp.zeros_like(y), y))
    assert fit < 0.5 * zero, (fit, zero)


def test_vi_w_posterior_contracts(key):
    s = make_tensor_synth(jax.random.PRNGKey(0), N=60, D=2, n=3, r=2, Q=4)
    state0 = init_vi(key, 3, 2, 2, 4, dtype=s.phi.dtype)
    state1 = vi_step(state0, s.phi, s.y[0.1], s.I, 0.01)
    # posterior covariance of w is smaller than the prior
    cfg_prior = (2 ** 2 / 4)  # σ_w² = r^D/Q
    assert float(jnp.trace(state1.sigma_w)) < 4 * cfg_prior
    assert state1.mu_w.shape == (4,)
    assert bool(jnp.all(jnp.isfinite(state1.mu_U)))
