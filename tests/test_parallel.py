"""Parallel-layer tests on the virtual 8-device CPU mesh.

The reference's multi-node story is single-host SharedArrays (SURVEY.md §4
"Multi-node testing: none"); these tests are what it lacked: sharded-vs-single
equivalence and chain-scaling checks without real hardware.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_tpu.data.synth import make_tensor_synth
from gpt_tpu.inference import SGLDConfig
from gpt_tpu.models.tensor_gp import TensorGPParams
from gpt_tpu.parallel import (
    cross_chain_moments,
    make_mesh,
    make_multichip_sgld_step,
)
from gpt_tpu.parallel.chains import init_chain_states, run_sharded_chains


@pytest.fixture(scope="module")
def synth():
    return make_tensor_synth(jax.random.PRNGKey(0), N=64, D=3, n=4, r=2, Q=8)


def test_mesh_shapes():
    mesh = make_mesh(chain=4, data=2)
    assert mesh.devices.shape == (4, 2)
    mesh_all = make_mesh()
    assert mesh_all.devices.size == len(jax.devices())


def test_multichip_step_runs_and_stays_finite(synth):
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(chain=4, data=2)
    cfg = SGLDConfig(eps=TensorGPParams(w=1e-4, U=1e-6), transport="cayley")
    y = synth.y[0.1]
    step = make_multichip_sgld_step(synth.model, mesh, cfg, y.shape[0])
    states = init_chain_states(synth.model, jax.random.PRNGKey(1), 8, cfg)
    states = jax.device_put(states, NamedSharding(mesh, P("chain")))
    wts = jnp.ones_like(y)
    out = step(states, synth.phi, y, wts)
    assert out.params.w.shape == (8, 8)
    assert bool(jnp.all(jnp.isfinite(out.params.w)))
    assert int(out.step[0]) == 1


def test_data_sharded_grad_matches_unsharded(synth):
    """The psum'd data-parallel gradient step must equal the single-device
    step bitwise-ish (same keys, same batch)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gpt_tpu.inference.sgld import make_sgld_step, sgld_init

    y = synth.y[0.1]
    N = y.shape[0]
    cfg = SGLDConfig(eps=TensorGPParams(w=1e-4, U=1e-6), transport="cayley")

    # sharded: 1 chain over (1 chain x 4 data)
    mesh = make_mesh(chain=1, data=4, devices=jax.devices()[:4])
    step_sharded = make_multichip_sgld_step(synth.model, mesh, cfg, N)
    states = init_chain_states(synth.model, jax.random.PRNGKey(1), 1, cfg)
    states_sh = jax.device_put(states, NamedSharding(mesh, P("chain")))
    wts = jnp.ones_like(y)
    out_sh = step_sharded(states_sh, synth.phi, y, wts)

    # unsharded reference step with identical grad definition
    def grad_fn(p, batch):
        phi_b, y_b, w_b = batch

        def logp(pp):
            scale = N / jnp.sum(w_b)
            return scale * synth.model.log_lik(pp, phi_b, y_b, weight=w_b) + synth.model.log_prior(pp)

        return jax.grad(logp)(p)

    step_single = make_sgld_step(grad_fn, synth.model.manifolds, cfg)
    st0 = jax.tree.map(lambda a: a[0], states)
    out_single = step_single(st0, (synth.phi, y, wts))
    np.testing.assert_allclose(
        out_sh.params.w[0], out_single.params.w, rtol=2e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        out_sh.params.U[0], out_single.params.U, rtol=2e-4, atol=1e-5
    )


def test_run_sharded_chains_recovers(synth):
    y = synth.y[0.1]
    mesh = make_mesh(chain=8, data=1)
    cfg = SGLDConfig(eps=TensorGPParams(w=3e-5, U=3e-7))
    final, collected = run_sharded_chains(
        synth.model, mesh, jax.random.PRNGKey(2), synth.phi, y,
        num_chains=8, m=32, config=cfg, burnin=10, maxepoch=5,
        collect_fn=lambda p: synth.model.predict(p, synth.phi),
    )
    assert collected.shape == (8, 5, 64)
    assert bool(jnp.all(jnp.isfinite(collected)))


def test_run_sharded_chains_adapt_sync_epoch(synth):
    """adapt_sync='epoch' (the DCN-friendly fleet-η coupling) runs, stays
    finite, and a stable config keeps η at 1 on every chain — identical
    fixed-point to per-step sync."""
    y = synth.y[0.1]
    mesh = make_mesh(chain=8, data=1)
    cfg = SGLDConfig(eps=TensorGPParams(w=3e-5, U=3e-7), adapt_eps=True)
    outs = {}
    for sync in ("step", "epoch"):
        final, collected = run_sharded_chains(
            synth.model, mesh, jax.random.PRNGKey(2), synth.phi, y,
            num_chains=8, m=32, config=cfg, burnin=4, maxepoch=3,
            collect_fn=lambda p: synth.model.predict(p, synth.phi),
            adapt_sync=sync,
        )
        assert bool(jnp.all(jnp.isfinite(collected)))
        np.testing.assert_allclose(np.asarray(final.eta), 1.0)
        outs[sync] = collected
    # stable run: no rejection ever fires, so the two sync policies are the
    # same program up to the (absent) coupling — results agree
    np.testing.assert_allclose(
        np.asarray(outs["step"]), np.asarray(outs["epoch"]), rtol=1e-6)


def test_cross_chain_moments():
    samples = jnp.stack([jnp.zeros((10, 3)), jnp.ones((10, 3)) * 2])
    mean, var = cross_chain_moments(samples)
    np.testing.assert_allclose(mean, jnp.ones((10, 3)))
    np.testing.assert_allclose(var, jnp.ones((10, 3)))


def test_gibbs_fleet_matches_unsharded():
    """Sharded Gibbs fleet (the reference's fold-parallel Gibbs sweeps,
    100k_movielensExperiment.jl:733) == vmapped unsharded chains exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpt_tpu.inference.gibbs import GibbsConfig, init_gibbs_params, run_gibbs
    from gpt_tpu.models import TensorGP, sample_core_indices
    from gpt_tpu.parallel import make_mesh, run_gibbs_fleet

    key = jax.random.PRNGKey(7)
    kI, kd, kr, kf = jax.random.split(key, 4)
    n, r, D, Q, N = 8, 2, 2, 4, 40
    I = sample_core_indices(kI, r, D, Q)
    model = TensorGP(n=n, r=r, D=D, I=I, signal_var=0.1)
    phi = jax.random.normal(kd, (N, D, n)) / jnp.sqrt(n)
    y = jax.random.normal(kr, (N,))

    mesh = make_mesh(chain=4, data=2)
    final, collected = run_gibbs_fleet(
        model, mesh, kf, phi, y, num_chains=8, num_iterations=5, burnin=2,
    )
    assert collected.w.shape[0] == 8

    # unsharded reference with the same key schedule
    kp, ks = jax.random.split(kf)
    params0 = jax.vmap(lambda k: init_gibbs_params(model, k, dtype=phi.dtype))(
        jax.random.split(kp, 8)
    )
    keys = jax.random.split(ks, 8)
    ref_final, ref_collected = jax.vmap(
        lambda p, k: run_gibbs(model, p, k, phi, y, num_iterations=5, burnin=2)
    )(params0, keys)
    np.testing.assert_allclose(
        np.asarray(collected.w), np.asarray(ref_collected.w), atol=1e-5
    )


def test_gmc_fleet_matches_unsharded():
    """Sharded GMC fleet == vmapped unsharded chains exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpt_tpu.inference import GMCConfig
    from gpt_tpu.inference.gmc import run_gmc
    from gpt_tpu.models import TensorGP, sample_core_indices
    from gpt_tpu.parallel import make_mesh, run_gmc_fleet

    key = jax.random.PRNGKey(9)
    kI, kd, kr, kf = jax.random.split(key, 4)
    n, r, D, Q, N = 8, 2, 2, 4, 30
    I = sample_core_indices(kI, r, D, Q)
    model = TensorGP(n=n, r=r, D=D, I=I, signal_var=0.1, precision="highest")
    phi = jax.random.normal(kd, (N, D, n)) / jnp.sqrt(n)
    y = jax.random.normal(kr, (N,))
    cfg = GMCConfig(eps=1e-5, num_leapfrog=3)

    mesh = make_mesh(chain=8, data=1)
    final, collected, accs = run_gmc_fleet(
        model, mesh, kf, phi, y, num_chains=8, config=cfg, burnin=1, maxepoch=3,
    )
    assert collected.w.shape[:2] == (8, 3)
    assert accs.shape == (8, 4)

    kp, ks = jax.random.split(kf)
    params0 = jax.vmap(model.init_params)(jax.random.split(kp, 8))
    params0 = jax.tree.map(lambda a: a.astype(phi.dtype), params0)
    keys = jax.random.split(ks, 8)
    _, ref_collected, ref_accs = jax.vmap(
        lambda p, k: run_gmc(model, p, k, phi, y, config=cfg, burnin=1, maxepoch=3)
    )(params0, keys)
    np.testing.assert_allclose(np.asarray(accs), np.asarray(ref_accs), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(collected.w), np.asarray(ref_collected.w), atol=1e-4
    )


def test_gmc_merged_fleet_matches_per_shard():
    """merged=True sharded GMC fleet == concatenated per-shard
    run_gmc_chains runs with the same fold_in keys (exact)."""
    import dataclasses

    import jax.numpy as jnp

    from gpt_tpu.data.synth import make_tensor_synth
    from gpt_tpu.inference import GMCConfig
    from gpt_tpu.inference.gmc import run_gmc_chains
    from gpt_tpu.models.tensor_gp import TensorGPParams
    from gpt_tpu.parallel import make_mesh, run_gmc_fleet

    synth = make_tensor_synth(jax.random.PRNGKey(0), N=60, D=3, n=4, r=2, Q=6)
    model = dataclasses.replace(synth.model, contraction="merged")
    y = synth.y[0.1]
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    C = 8
    cfg = GMCConfig(eps=TensorGPParams(w=1e-4, U=1e-5), num_leapfrog=3)

    key = jax.random.PRNGKey(7)
    final, collected, accs = run_gmc_fleet(
        model, mesh, key, synth.phi, y, num_chains=C, config=cfg,
        burnin=1, maxepoch=3, merged=True,
    )
    assert final.w.shape == (C, model.Q)
    assert accs.shape == (C, 4)

    # reference: per-shard runs with the same key schedule
    kp, ks = jax.random.split(key)
    params0 = jax.vmap(model.init_params)(jax.random.split(kp, C))
    params0 = jax.tree.map(lambda a: a.astype(synth.phi.dtype), params0)
    per = C // 4
    for d in range(4):
        sl = slice(d * per, (d + 1) * per)
        f_d, c_d, a_d = run_gmc_chains(
            model, jax.tree.map(lambda a: a[sl], params0),
            jax.random.fold_in(ks, d), synth.phi, y, config=cfg,
            burnin=1, maxepoch=3,
        )
        np.testing.assert_allclose(
            np.asarray(final.w[sl]), np.asarray(f_d.w), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(accs[sl]), np.asarray(jnp.swapaxes(a_d, 0, 1)),
            rtol=1e-5, atol=1e-6
        )


def test_manifold_nuts_fleet_sharded():
    """Sharded chain-merged manifold-NUTS fleet: shapes, manifold adherence,
    and exact agreement with per-shard run_manifold_nuts_chains calls under
    the same fold_in keys."""
    import dataclasses

    from gpt_tpu.inference.manifold_nuts import run_manifold_nuts_chains
    from gpt_tpu.inference.nuts import NUTSConfig
    from gpt_tpu.parallel import run_manifold_nuts_fleet

    synth = make_tensor_synth(jax.random.PRNGKey(0), N=60, D=3, n=4, r=2, Q=6)
    model = dataclasses.replace(synth.model, contraction="merged")
    y = synth.y[0.1]
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    C = 8
    eps = TensorGPParams(w=2e-4, U=2e-6)
    cfg = NUTSConfig(max_depth=4, init_step_size=1.0)
    key = jax.random.PRNGKey(7)
    samples, stats, step, finals = run_manifold_nuts_fleet(
        model, mesh, key, synth.phi, y, num_chains=C, eps=eps,
        num_warmup=5, num_samples=6, config=cfg,
    )
    assert samples.w.shape == (C, 6, model.Q)
    assert stats["accept_stat"].shape == (C, 6) and step.shape == (C,)
    UtU = jnp.einsum("csdni,csdnj->csdij", samples.U, samples.U)
    assert float(jnp.max(jnp.abs(UtU - jnp.eye(model.r)))) < 1e-3

    # exact per-shard reference: same init split, same fold_in shard keys
    kp, ks = jax.random.split(key)
    params0 = jax.vmap(model.init_params)(jax.random.split(kp, C))
    params0 = jax.tree.map(lambda a: a.astype(synth.phi.dtype), params0)
    per = C // 4
    ref_w = []
    for i in range(4):
        shard = jax.tree.map(lambda a: a[i * per:(i + 1) * per], params0)
        s_i, _, _, _ = run_manifold_nuts_chains(
            model, shard, jax.random.fold_in(ks, i), synth.phi, y, eps=eps,
            num_warmup=5, num_samples=6, config=cfg,
        )
        ref_w.append(np.asarray(jnp.swapaxes(s_i.w, 0, 1)))
    np.testing.assert_allclose(
        np.asarray(samples.w), np.concatenate(ref_w, axis=0), atol=1e-5)
