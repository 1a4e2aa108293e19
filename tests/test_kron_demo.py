"""Kronecker-experiment + prior-draw-demo tests."""
import jax
import jax.numpy as jnp
import numpy as np

from gpt_tpu.experiments.demo import create_mesh_grid, prior_draw
from gpt_tpu.experiments.kron import build_kron_problem, kron_eigen_factor, run_tensor2d_kron
from gpt_tpu.models.exact_gp import se_iso


def test_kron_eigen_factor_reconstructs(key):
    X = jax.random.normal(key, (12, 2))
    K = se_iso(1.0, 1.0)(X, X)
    F = kron_eigen_factor(K)
    np.testing.assert_allclose(F @ F.T, K, atol=1e-8)


def test_create_mesh_grid():
    x, y, grid = create_mesh_grid(0.0, 1.0, 4)
    assert grid.shape == (16, 2)
    # x varies slowest (reference ordering, GPT_SGLD.jl:293-298)
    np.testing.assert_allclose(grid[:4, 0], np.zeros(4))
    np.testing.assert_allclose(grid[:4, 1], np.linspace(0, 1, 4))


def test_prior_draw_variance_matches_kernel(key):
    """MC variance of tensor prior draws ≈ the SE kernel's marginal variance
    σ_RBF² — the Diagnostic_f_fhat.jl / GPT_demo sanity check, quantified."""
    from gpt_tpu.models import sample_core_indices

    _, _, grid = create_mesh_grid(-1.0, 1.0, 5)
    sigma_RBF = 1.3
    I = sample_core_indices(jax.random.fold_in(key, 1), 3, 2, 9)

    draws = jax.vmap(
        lambda k: prior_draw(k, grid, n=12, r=3, Q=9, sigma_RBF=sigma_RBF, I=I).f
    )(jax.random.split(key, 800))
    var = jnp.mean(draws**2, axis=0)  # (25,) pointwise prior variance
    # matched within MC error across the whole grid
    np.testing.assert_allclose(
        jnp.mean(var), sigma_RBF**2, rtol=0.2
    )


def test_tensor2d_kron_recovers_gp_draw(key):
    """Gridded 2-axis data from a GP with Kronecker SE kernel: the tensor2d
    model over eigenfactor features recovers it (UK-temperature workload)."""
    kg, kd, kn, kr = jax.random.split(key, 4)
    n1, n2 = 12, 15
    grid1 = jax.random.normal(kg, (n1, 2))
    grid2 = jnp.linspace(0, 3, n2)[:, None]
    k1, k2 = se_iso(1.0, 1.0), se_iso(0.7, 1.0)
    # full-grid GP draw via Kronecker structure
    F1 = kron_eigen_factor(k1(grid1, grid1))
    F2 = kron_eigen_factor(k2(grid2, grid2))
    Z = jax.random.normal(kd, (n1, n2))
    Fgrid = F1 @ Z @ F2.T  # cov = K1 ⊗ K2
    i1, i2 = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    y = (Fgrid.ravel() + 0.05 * jax.random.normal(kn, (n1 * n2,)))

    prob = build_kron_problem(grid1, grid2, k1, k2, i1.ravel(), i2.ravel(), np.asarray(y))
    run = run_tensor2d_kron(
        prob, kr, r=8, signal_var=0.01, epsw=5e-5, epsU=5e-5,
        m=50, burnin=100, maxepoch=200,
    )
    zero_rmse = float(jnp.sqrt(jnp.mean(prob.y_test**2)))
    assert run.rejected == 0
    # reaches ~0.14x the zero-prediction RMSE (noise sd 0.05, zero-pred 0.70)
    assert float(run.avg_pred_rmse) < 0.35 * zero_rmse, (run.avg_pred_rmse, zero_rmse)
