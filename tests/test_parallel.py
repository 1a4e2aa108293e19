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


def test_cross_chain_moments():
    samples = jnp.stack([jnp.zeros((10, 3)), jnp.ones((10, 3)) * 2])
    mean, var = cross_chain_moments(samples)
    np.testing.assert_allclose(mean, jnp.ones((10, 3)))
    np.testing.assert_allclose(var, jnp.ones((10, 3)))
