"""Stiefel geometry tests: manifold invariants, geodesic properties, transport."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_tpu.utils import stiefel


def _rand_point_tangent(key, n=12, r=4, batch=()):
    k1, k2 = jax.random.split(key)
    U = stiefel.sample_stiefel(k1, n, r, batch=batch)
    V = jax.random.normal(k2, (*batch, n, r))
    mom = stiefel.project_tangent(U, V)
    return U, mom


def test_sample_stiefel_orthonormal(key):
    U = stiefel.sample_stiefel(key, 20, 5)
    np.testing.assert_allclose(U.T @ U, np.eye(5), atol=1e-5)


def test_sample_stiefel_batched(key):
    U = stiefel.sample_stiefel(key, 10, 3, batch=(4, 2))
    assert U.shape == (4, 2, 10, 3)
    UtU = jnp.einsum("...ni,...nj->...ij", U, U)
    np.testing.assert_allclose(UtU, np.broadcast_to(np.eye(3), (4, 2, 3, 3)), atol=1e-5)


def test_project_tangent_is_tangent(key):
    U, mom = _rand_point_tangent(key)
    # Tangent condition: Uᵀmom + momᵀU = 0 (skew-symmetric UᵀH).
    sym = U.T @ mom + mom.T @ U
    np.testing.assert_allclose(sym, np.zeros_like(sym), atol=1e-5)


def test_project_idempotent(key):
    U, mom = _rand_point_tangent(key)
    np.testing.assert_allclose(stiefel.project_tangent(U, mom), mom, atol=1e-5)


def test_geodesic_stays_on_manifold(key):
    U, mom = _rand_point_tangent(key)
    U1 = stiefel.geodesic(U, mom, 0.1)
    np.testing.assert_allclose(U1.T @ U1, np.eye(4), atol=1e-4)


def test_geodesic_zero_time_identity(key):
    U, mom = _rand_point_tangent(key)
    np.testing.assert_allclose(stiefel.geodesic(U, mom, 0.0), U, atol=1e-5)


def test_geodesic_initial_velocity(key):
    """d/dt U(t) at t=0 equals the momentum (finite differences)."""
    U, mom = _rand_point_tangent(key)
    h = 1e-4
    vel = (stiefel.geodesic(U, mom, h) - stiefel.geodesic(U, mom, -h)) / (2 * h)
    np.testing.assert_allclose(vel, mom, atol=1e-2)


def test_geodesic_with_momentum_conserves_energy(key):
    """Parallel transport preserves ‖mom‖ along the geodesic."""
    U, mom = _rand_point_tangent(key)
    U1, mom1 = stiefel.geodesic_with_momentum(U, mom, 0.05)
    np.testing.assert_allclose(
        jnp.sum(mom1**2), jnp.sum(mom**2), rtol=1e-3
    )
    # transported momentum is tangent at the endpoint
    sym = U1.T @ mom1 + mom1.T @ U1
    np.testing.assert_allclose(sym, np.zeros_like(sym), atol=1e-3)


def test_geodesic_batched_matches_loop(key):
    U, mom = _rand_point_tangent(key, batch=(3,))
    out = stiefel.geodesic(U, mom, 0.1)
    for d in range(3):
        np.testing.assert_allclose(
            out[d], stiefel.geodesic(U[d], mom[d], 0.1), atol=1e-5
        )


def test_cayley_stays_on_manifold(key):
    U, mom = _rand_point_tangent(key)
    U1 = stiefel.cayley_retract(U, mom, 0.1)
    np.testing.assert_allclose(U1.T @ U1, np.eye(4), atol=1e-4)


def test_cayley_first_order_matches_geodesic(key):
    """Cayley and geodesic agree to O(t²)."""
    U, mom = _rand_point_tangent(key)
    t = 1e-3
    g = stiefel.geodesic(U, mom, t)
    c = stiefel.cayley_retract(U, mom, t)
    assert jnp.max(jnp.abs(g - c)) < 5 * t**2 * jnp.max(jnp.abs(mom)) ** 2 + 1e-5


def test_polar_stays_on_manifold(key):
    U, mom = _rand_point_tangent(key)
    U1 = stiefel.polar_retract(U, mom, 0.1)
    np.testing.assert_allclose(U1.T @ U1, np.eye(4), atol=1e-5)


def test_polar_first_order_matches_geodesic(key):
    """Polar and geodesic retractions agree to O(t²)."""
    U, mom = _rand_point_tangent(key)
    t = 1e-3
    g = stiefel.geodesic(U, mom, t)
    p = stiefel.polar_retract(U, mom, t)
    assert jnp.max(jnp.abs(g - p)) < 5 * t**2 * jnp.max(jnp.abs(mom)) ** 2 + 1e-5


def test_polar_batched_and_jittable(key):
    U = stiefel.sample_stiefel(key, 12, 4, batch=(3, 2))
    mom = stiefel.project_tangent(
        U, jax.random.normal(jax.random.fold_in(key, 1), U.shape, U.dtype)
    )
    t = jnp.full((3, 2), 1e-2)
    out = jax.jit(stiefel.polar_retract)(U, mom, t)
    UtU = jnp.einsum("...ni,...nj->...ij", out, out)
    np.testing.assert_allclose(
        np.asarray(UtU), np.broadcast_to(np.eye(4), UtU.shape), atol=1e-6
    )


def test_guard_rejects_nan(key):
    U, _ = _rand_point_tangent(key)
    bad = U.at[0, 0].set(jnp.nan)
    safe, rejected = stiefel.guard(bad, U)
    np.testing.assert_allclose(safe, U)
    assert bool(rejected)
    safe2, rejected2 = stiefel.guard(U, bad)
    np.testing.assert_allclose(safe2, U)
    assert not bool(rejected2)


def test_geodesic_jit_and_grad(key):
    """Geodesic is jit-able and differentiable (needed for GMC)."""
    U, mom = _rand_point_tangent(key)

    @jax.jit
    def loss(m):
        return jnp.sum(stiefel.geodesic(U, m, 0.05) ** 2)

    g = jax.grad(loss)(mom)
    assert jnp.all(jnp.isfinite(g))


def test_expm_taylor_matches_pade(key):
    """Matmul-only scaling-and-squaring expm ≡ Padé expm to f32 precision
    at leapfrog-scale arguments (and well beyond: ‖X‖ up to ~4)."""
    import jax.numpy as jnp
    import numpy as np
    from jax.scipy.linalg import expm as pade

    from gpt_tpu.utils.stiefel import expm_taylor

    for scale in (1e-3, 0.1, 1.0):
        X = scale * jax.random.normal(jax.random.fold_in(key, int(scale * 1e3)),
                                      (6, 10, 10))
        E_t = expm_taylor(X)
        E_p = jax.vmap(pade)(X)
        np.testing.assert_allclose(np.asarray(E_t), np.asarray(E_p),
                                   rtol=2e-5, atol=2e-6)


def test_geodesic_taylor_matches_pade(key):
    import jax.numpy as jnp
    import numpy as np

    from gpt_tpu.utils import stiefel

    n, r = 20, 4
    U = stiefel.sample_stiefel(key, n, r, batch=(3,))
    mom = stiefel.project_tangent(
        U, jax.random.normal(jax.random.fold_in(key, 1), (3, n, r))
    )
    t = 3e-3
    Up, mp = stiefel.geodesic_with_momentum(U, mom, t, "pade")
    Ut, mt = stiefel.geodesic_with_momentum(U, mom, t, "taylor")
    np.testing.assert_allclose(np.asarray(Ut), np.asarray(Up),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mt), np.asarray(mp),
                               rtol=1e-5, atol=1e-5)
    # endpoint stays on the manifold
    assert float(stiefel.check_orthonormal(Ut)) < 1e-5


def test_project_tangent_fleet_matches_per_chain(key):
    import jax.numpy as jnp
    import numpy as np

    from gpt_tpu.utils import stiefel

    C, D, n, r = 5, 3, 12, 4
    U = stiefel.sample_stiefel(key, n, r, batch=(C, D))
    V = jax.random.normal(jax.random.fold_in(key, 1), (C, D, n, r))
    ref = stiefel.project_tangent(U, V)
    merged = stiefel.project_tangent_fleet(U, V)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # single batch axis (C, n, r) works too
    ref2 = stiefel.project_tangent(U[:, 0], V[:, 0])
    merged2 = stiefel.project_tangent_fleet(U[:, 0], V[:, 0])
    np.testing.assert_allclose(np.asarray(merged2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-6)
