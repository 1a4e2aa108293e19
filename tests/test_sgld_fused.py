"""Chain-batched fused SGLD runner (`run_sgld_chains_fused`).

The fused runner drives all chains through one transition kernel with an
explicit leading chain axis, which lets the model use the chain-batched
Pallas contraction. Correctness here is *exact* (not statistical): with the
same PRNG key the fused runner consumes the identical noise/permutation
stream regardless of which contraction backend the model routes through, so
a pallas-backed run must match an XLA-backed run to float tolerance.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gpt_tpu.inference import SGLDConfig, run_sgld, run_sgld_chains_fused
from gpt_tpu.models import TensorGP, sample_core_indices
from gpt_tpu.models.tensor_gp import TensorGPParams


def _setup(key, C=3, N=37, D=3, n=16, r=4, Q=12):
    kI, kphi, ky, kp, ks = jax.random.split(key, 5)
    I = sample_core_indices(kI, r, D, Q)
    phi = jax.random.normal(kphi, (N, D, n), jnp.float32)
    y = jax.random.normal(ky, (N,), jnp.float32)
    model = TensorGP(n=n, r=r, D=D, I=I, signal_var=0.5)
    params0 = jax.vmap(model.init_params)(jax.random.split(kp, C))
    params0 = jax.tree.map(lambda a: a.astype(jnp.float32), params0)
    return model, params0, phi, y, ks


def test_fused_pallas_matches_xla_runner(key):
    model, params0, phi, y, ks = _setup(key)
    config = SGLDConfig(
        eps=TensorGPParams(w=1e-4, U=1e-6), transport="cayley"
    )

    outs = {}
    for contraction in ("onehot", "pallas"):
        m = dataclasses.replace(model, contraction=contraction, diff_phi=False)
        final, collected = run_sgld_chains_fused(
            m, params0, ks, phi, y, m=8, config=config, burnin=1, maxepoch=2
        )
        outs[contraction] = (final, collected)

    for leaf_a, leaf_b in zip(
        jax.tree.leaves(outs["onehot"][1]), jax.tree.leaves(outs["pallas"][1])
    ):
        np.testing.assert_allclose(
            np.asarray(leaf_a, np.float64), np.asarray(leaf_b, np.float64),
            rtol=2e-3, atol=2e-5,
        )
    assert int(outs["pallas"][0].rejected) == 0


def test_fused_single_chain_matches_run_sgld(key):
    """C=1 fused run ≡ plain single-chain run (same key ⇒ same stream)."""
    model, params0, phi, y, ks = _setup(key, C=1)
    config = SGLDConfig(eps=TensorGPParams(w=1e-4, U=1e-6), transport="cayley")

    fused_final, fused_coll = run_sgld_chains_fused(
        model, params0, ks, phi, y, m=8, config=config, burnin=1, maxepoch=2
    )
    single0 = jax.tree.map(lambda a: a[0], params0)
    plain_final, plain_coll = run_sgld(
        model, single0, ks, phi, y, m=8, config=config, burnin=1, maxepoch=2
    )
    np.testing.assert_allclose(
        np.asarray(fused_coll.w[0]), np.asarray(plain_coll.w),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(fused_final.params.U[0]), np.asarray(plain_final.params.U),
        rtol=1e-5, atol=1e-7,
    )


def test_fused_chains_decorrelated_noise(key):
    """Chains share the minibatch stream but must receive independent
    Langevin noise — final params must differ across chains even from a
    common initialisation."""
    model, params0, phi, y, ks = _setup(key, C=4)
    common = jax.tree.map(
        lambda a: jnp.broadcast_to(a[:1], a.shape), params0
    )
    config = SGLDConfig(eps=TensorGPParams(w=1e-3, U=1e-5), transport="cayley")
    final, _ = run_sgld_chains_fused(
        model, common, ks, phi, y, m=8, config=config, burnin=0, maxepoch=2
    )
    w = np.asarray(final.params.w)
    assert np.abs(w[0] - w[1]).max() > 1e-6
    assert np.abs(w[1] - w[2]).max() > 1e-6
