"""Manifold NUTS: dynamic trajectories for the Stiefel tensor-GP model.

Beyond-parity engine (the reference's Stan/Mamba gold standards are
Euclidean-only — ``california/tensor2d.stan:29-35`` relaxes the factors to
Gaussian priors because Stan cannot do Stiefel). Checks: posterior recovery,
manifold adherence over dynamic trajectories, healthy adapted acceptance,
and that dynamic trajectories actually vary in length.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_tpu.data.synth import make_tensor_synth
from gpt_tpu.inference.manifold_nuts import run_manifold_nuts
from gpt_tpu.inference.nuts import NUTSConfig
from gpt_tpu.models.tensor_gp import TensorGPParams
from gpt_tpu.utils import stiefel
from gpt_tpu.utils.math import rmse


@pytest.fixture(scope="module")
def synth():
    return make_tensor_synth(jax.random.PRNGKey(0), N=150, D=3, n=4, r=2, Q=8)


def test_manifold_nuts_recovers_and_stays_on_manifold(synth):
    y = synth.y[0.1]
    params0 = synth.model.init_params(jax.random.PRNGKey(3))
    prior = float(rmse(synth.model.predict(params0, synth.phi), y))
    cfg = NUTSConfig(max_depth=6, init_step_size=1.0)
    samples, stats, step = run_manifold_nuts(
        synth.model, params0, jax.random.PRNGKey(4), synth.phi, y,
        eps=TensorGPParams(w=2e-4, U=2e-6),
        num_warmup=60, num_samples=60, config=cfg,
    )
    # dynamic trajectories: lengths vary and U-turns terminate most of them
    n_lf = np.asarray(stats["n_leapfrog"])
    assert n_lf.std() > 0 and n_lf.max() > 2
    assert float(np.asarray(stats["accept_stat"]).mean()) > 0.5
    assert not bool(np.asarray(stats["diverged"]).any())
    # every kept draw is on the manifold
    UtU = jnp.einsum("sdni,sdnj->sdij", samples.U, samples.U)
    assert float(jnp.max(jnp.abs(UtU - jnp.eye(synth.model.r)))) < 1e-3
    preds = jax.vmap(lambda p: synth.model.predict(p, synth.phi))(samples)
    post = float(rmse(jnp.mean(preds, 0), y))
    assert post < 0.7 * prior, (post, prior)


def test_manifold_nuts_fleet_matches_vmapped_chains(synth):
    """The chain-merged fleet runner (one merged gradient per tree leaf)
    agrees with vmap(run_manifold_nuts) statistically: same posterior
    predictions within MC error, per-chain dynamic trees, manifold adherence,
    healthy acceptance."""
    import dataclasses

    from gpt_tpu.inference.manifold_nuts import run_manifold_nuts_chains

    y = synth.y[0.1]
    C = 4
    model_m = dataclasses.replace(synth.model, contraction="merged")
    inits = jax.vmap(synth.model.init_params)(
        jax.random.split(jax.random.PRNGKey(7), C)
    )
    eps = TensorGPParams(w=2e-4, U=2e-6)
    cfg = NUTSConfig(max_depth=5, init_step_size=1.0)
    samples, stats, step, finals = run_manifold_nuts_chains(
        model_m, inits, jax.random.PRNGKey(8), synth.phi, y,
        eps=eps, num_warmup=50, num_samples=50, config=cfg,
    )
    assert samples.w.shape == (50, C, synth.model.Q)
    assert stats["accept_stat"].shape == (50, C) and step.shape == (C,)
    # final params chain segments: equal to the last kept draw, on-manifold
    assert bool(jnp.allclose(finals.w, samples.w[-1]))
    n_lf = np.asarray(stats["n_leapfrog"])
    assert n_lf.std() > 0 and n_lf.max() > 2
    assert float(np.asarray(stats["accept_stat"]).mean()) > 0.5
    assert not bool(np.asarray(stats["diverged"]).any())
    # every kept draw of every chain on-manifold
    UtU = jnp.einsum("scdni,scdnj->scdij", samples.U, samples.U)
    assert float(jnp.max(jnp.abs(UtU - jnp.eye(synth.model.r)))) < 1e-3

    # statistical agreement with the vmapped single-chain engine
    ref_samples, ref_stats, _ = jax.vmap(
        lambda p0, k: run_manifold_nuts(
            synth.model, p0, k, synth.phi, y, eps=eps,
            num_warmup=50, num_samples=50, config=cfg,
        )
    )(inits, jax.random.split(jax.random.PRNGKey(9), C))
    pred_fleet = jnp.mean(
        jax.vmap(jax.vmap(lambda p: synth.model.predict(p, synth.phi)))(samples),
        axis=(0, 1),
    )
    pred_ref = jnp.mean(
        jax.vmap(jax.vmap(lambda p: synth.model.predict(p, synth.phi)))(
            ref_samples
        ),
        axis=(0, 1),
    )
    from gpt_tpu.utils.math import rmse as _rmse

    gap = float(_rmse(pred_fleet, pred_ref))
    spread = float(jnp.std(y))
    assert gap < 0.35 * spread, (gap, spread)


def test_manifold_nuts_reduces_to_euclidean_dynamics(synth):
    """With stiefel=False the same machinery samples the Euclidean model."""
    import dataclasses

    model = dataclasses.replace(synth.model, stiefel=False)
    y = synth.y[0.1]
    params0 = model.init_params(jax.random.PRNGKey(5))
    samples, stats, _ = run_manifold_nuts(
        model, params0, jax.random.PRNGKey(6), synth.phi, y,
        eps=TensorGPParams(w=2e-4, U=2e-5),
        num_warmup=40, num_samples=40,
        config=NUTSConfig(max_depth=5, init_step_size=1.0),
    )
    assert float(np.asarray(stats["accept_stat"]).mean()) > 0.5
    assert bool(jnp.all(jnp.isfinite(samples.w)))
