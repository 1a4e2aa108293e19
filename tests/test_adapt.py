"""Cross-chain step-size adaptation (SGLDConfig.adapt_eps).

SURVEY §2.9 names cross-chain step-size adaptation as a first-class
TPU-native capability; the reference's answer to a diverged config was a NaN
abort + hand-retuning (``GPT_SGLD.jl:23-26``, the logged RMSE=NaN sweeps at
``DataRecords.txt:61``). Here the fleet-shared backoff must (a) change
NOTHING in the stable regime and (b) self-recover a diverging config.
"""
import jax
import jax.numpy as jnp
import numpy as np

from gpt_tpu.inference import SGLDConfig, run_sgld
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams


def _problem(key, N=60):
    kI, kp, kx, kn, kr = jax.random.split(key, 5)
    n, r, D, Q = 8, 3, 3, 12
    I = sample_core_indices(kI, r, D, Q)
    model = TensorGP(n=n, r=r, D=D, I=I, signal_var=0.05)
    phi = jax.random.normal(kx, (N, D, n)) / jnp.sqrt(n)
    true_p = model.init_params(kr)
    y = model.predict(true_p, phi) + 0.2 * jax.random.normal(kn, (N,))
    return model, phi, y, kp


def test_adapted_equals_fixed_in_stable_regime(key):
    """eta stays pinned at 1 with no rejections — bitwise-identical run."""
    model, phi, y, kp = _problem(key)
    params0 = jax.vmap(model.init_params)(jax.random.split(kp, 4))
    base = dict(eps=TensorGPParams(w=1e-4, U=1e-6), transport="polar")
    run = lambda cfg: run_sgld(
        model, params0, jax.random.PRNGKey(3), phi, y, m=20,
        config=cfg, burnin=0, maxepoch=5, collect_fn=lambda p: (),
    )[0]
    fixed = run(SGLDConfig(**base))
    adapted = run(SGLDConfig(**base, adapt_eps=True, adapt_patience=2))
    assert int(fixed.rejected) == 0
    np.testing.assert_array_equal(np.asarray(fixed.params.w),
                                  np.asarray(adapted.params.w))
    np.testing.assert_array_equal(np.asarray(fixed.params.U),
                                  np.asarray(adapted.params.U))
    assert float(adapted.eta) == 1.0


def test_adaptation_recovers_diverging_config(key):
    """A deliberately absurd step size: fixed-eps rejects throughout and ends
    useless; adapt_eps backs off within a few steps and trains."""
    model, phi, y, kp = _problem(key)
    params0 = jax.vmap(model.init_params)(jax.random.split(kp, 4))
    # w-eps large enough to blow up the quadratic likelihood immediately
    bad = dict(eps=TensorGPParams(w=5.0, U=1e-2), transport="polar")

    def run(cfg, maxepoch):
        return run_sgld(
            model, params0, jax.random.PRNGKey(3), phi, y, m=20,
            config=cfg, burnin=0, maxepoch=maxepoch, collect_fn=lambda p: (),
        )[0]

    fixed = run(SGLDConfig(**bad), 40)
    acfg = SGLDConfig(**bad, adapt_eps=True, adapt_patience=10**9,
                      adapt_floor=1e-6)
    half = run(acfg, 10)
    adapted = run(acfg, 40)
    n_steps = 40 * 3  # epochs x batches
    # fixed-eps: rejections persist through the whole run
    assert int(fixed.rejected) > n_steps // 2
    # adapted: the backoff settles within the first 10 epochs — NO further
    # rejections in epochs 10..40 (measured: 159 rejections at both horizons)
    assert int(adapted.rejected) == int(half.rejected)
    # the r4 norm-growth cap catches divergence BEFORE params blow up into
    # NaN territory, so fewer halvings are needed than when only non-finite
    # updates rejected (eta settled <1e-3 then; ~4e-3 now)
    assert float(adapted.eta) < 1e-2
    assert bool(jnp.all(jnp.isfinite(adapted.params.w)))
    assert bool(jnp.all(jnp.isfinite(adapted.params.U)))
    assert float(jnp.max(jnp.abs(adapted.params.w - params0.w))) > 0


def test_sharded_fleet_coupling(key):
    """run_sharded_chains with adapt_eps: the most conservative chain's eta is
    broadcast fleet-wide each step (all chains share one step scale)."""
    from gpt_tpu.parallel import make_mesh, run_sharded_chains

    model, phi, y, kp = _problem(key)
    mesh = make_mesh(chain=4, data=2)
    cfg = SGLDConfig(eps=TensorGPParams(w=1e-4, U=1e-6), transport="polar",
                     adapt_eps=True, adapt_patience=3)
    states, collected = run_sharded_chains(
        model, mesh, jax.random.PRNGKey(2), phi, y,
        num_chains=8, m=20, config=cfg, burnin=1, maxepoch=2,
    )
    etas = np.asarray(states.eta)
    assert etas.shape == (8,)
    assert np.all(etas == etas[0])  # fleet-shared
    assert bool(jnp.all(jnp.isfinite(collected.w)))
