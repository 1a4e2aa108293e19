"""Regression tests for code-review findings (round 1 self-review)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_tpu.inference.sgld import SGLDConfig, make_sgld_step, sgld_init


def test_one_diverged_chain_does_not_freeze_fleet(key):
    """Euclidean NaN rejection is per-chain: a NaN gradient in chain 0 must
    reject chain 0's WHOLE step (no coordinate mixing — one NaN coordinate
    means the whole update came from a corrupted gradient) without blocking
    chain 1's update, and must count exactly one rejection per bad chain."""
    params = jnp.zeros((2, 3))  # 2 chains, 3 coords

    def grad_fn(p, _):
        g = jnp.ones_like(p)
        return g.at[0, 1].set(jnp.nan)  # ONE coordinate of chain 0 diverges

    cfg = SGLDConfig(eps=1e-2, langevin=False)
    step = make_sgld_step(grad_fn, "euclidean", cfg, event_ndims=1)
    st = sgld_init(params, key, cfg)
    st = step(st, None)
    w = np.asarray(st.params)
    assert np.all(w[0] == 0.0)          # diverged chain fully rejected
    assert np.all(w[1] > 0.0)           # healthy chain moved
    assert int(st.rejected) == 1        # per-chain accounting, not jnp.any


def test_cf_gibbs_rejects_side_info_model(key):
    from gpt_tpu.inference.cf_gibbs import cf_gibbs_sweep
    from gpt_tpu.models.cf import CFBatch, CFModel

    model = CFModel(n1=4, n2=5, r=2, signal_var=0.5, sigma_u=1.0,
                    a=1.0, b=0.25, c=0.5,
                    user_data=jnp.ones((4, 2)), movie_data=jnp.ones((5, 3)))
    params = model.init_params(key)
    batch = CFBatch(users=jnp.zeros(3, jnp.int32), movies=jnp.arange(3))
    with pytest.raises(ValueError, match="plain bilinear"):
        cf_gibbs_sweep(model, params, key, batch, jnp.zeros(3))


def test_cf_gibbs_honors_a_scaling(key):
    """With a != 1 the conditional draws must target the scaled model: a
    chain on data generated with a=2 should reach low residual RMSE."""
    from gpt_tpu.inference.cf_gibbs import run_cf_gibbs
    from gpt_tpu.models.cf import CFBatch, CFModel

    n1, n2, r, N = 30, 25, 3, 1500
    a = 2.0
    kU, kV, kw, ki, kn, ks, kp = jax.random.split(key, 7)
    U = jax.random.normal(kU, (n1, r)) * 0.5
    V = jax.random.normal(kV, (n2, r)) * 0.5
    w = jax.random.normal(kw, (r, r))
    users = jax.random.randint(ki, (N,), 0, n1)
    movies = jax.random.randint(jax.random.fold_in(ki, 1), (N,), 0, n2)
    f = a * jnp.einsum("ns,st,nt->n", U[users], w, V[movies])
    y = f + 0.1 * jax.random.normal(kn, (N,))

    model = CFModel(n1=n1, n2=n2, r=r, signal_var=0.01, sigma_u=1.0, a=a)
    params0 = model.init_params(kp)
    ratings = jnp.stack([users.astype(jnp.float32),
                         movies.astype(jnp.float32), y], axis=1)
    final, _ = run_cf_gibbs(model, params0, ks, ratings, burnin=20, maxepoch=1)
    pred = model.predict(final, CFBatch(users=users, movies=movies))
    rmse = float(jnp.sqrt(jnp.mean((pred - y) ** 2)))
    assert rmse < 0.25, rmse


def test_vi_step_is_jittable(key):
    from gpt_tpu.inference.vi import VIConfig, init_vi, vi_step
    from gpt_tpu.models import sample_core_indices

    n, r, D, Q, N = 4, 2, 3, 6, 20
    I = sample_core_indices(key, r, D, Q)
    phi = jax.random.normal(jax.random.fold_in(key, 1), (N, D, n)) / jnp.sqrt(n)
    y = jax.random.normal(jax.random.fold_in(key, 2), (N,))
    state = init_vi(jax.random.fold_in(key, 3), n, r, D, Q, dtype=phi.dtype)
    jitted = jax.jit(lambda s: vi_step(s, phi, y, I, 0.1, VIConfig()))
    out = jitted(state)
    assert bool(jnp.all(jnp.isfinite(out.mu_w)))
    # jit result matches eager
    eager = vi_step(state, phi, y, I, 0.1, VIConfig())
    np.testing.assert_allclose(np.asarray(out.mu_w), np.asarray(eager.mu_w),
                               rtol=1e-5, atol=1e-8)
