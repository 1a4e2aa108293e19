"""Pallas fused-contraction tests (interpret mode on CPU).

Parity of the fused kernel + hand-derived VJP against the XLA einsum path and
``jax.grad`` — the framework's version of the reference's finite-difference
gradient checks (``Diagnostic_gradients.jl``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_tpu.models import sample_core_indices
from gpt_tpu.ops.contraction import tensor_predict
from gpt_tpu.ops.pallas_contraction import fused_tensor_predict


@pytest.fixture
def setup(key):
    C, m, D, n, r, Q = 3, 16, 4, 32, 5, 24
    k1, k2, k3, k4 = jax.random.split(key, 4)
    I = sample_core_indices(k1, r, D, Q)
    w = jax.random.normal(k2, (C, Q), jnp.float32)
    U = jax.random.normal(k3, (C, D, n, r), jnp.float32) / jnp.sqrt(n)
    phi = jax.random.normal(k4, (m, D, n), jnp.float32)
    return w, U, I, phi


def test_fused_forward_matches_xla(setup):
    w, U, I, phi = setup
    out = fused_tensor_predict(w, U, I, phi, interpret=True)
    ref = tensor_predict(w, U, I, phi)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-5)


def test_fused_vjp_matches_autodiff(setup):
    w, U, I, phi = setup
    y = jnp.ones(phi.shape[0], jnp.float32)

    def loss_fused(w, U, phi):
        f = fused_tensor_predict(w, U, I, phi, interpret=True)
        return jnp.sum((f - y[None, :]) ** 2)

    def loss_ref(w, U, phi):
        f = tensor_predict(w, U, I, phi)
        return jnp.sum((f - y[None, :]) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(w, U, phi)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(w, U, phi)
    for a, b, name in zip(gf, gr, ["w", "U", "phi"]):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-4, err_msg=name)


def test_fused_zero_inner_product_safe(setup):
    """Leave-one-out via prefix/suffix products has no division — a zero
    ⟨φ, U_col⟩ must give finite gradients (the reference's computeU_phi
    divides and would produce NaN)."""
    w, U, I, phi = setup
    U = U.at[:, 0, :, :].set(0.0)  # force g_0 = 0 everywhere

    g = jax.grad(
        lambda U_: jnp.sum(fused_tensor_predict(w, U_, I, phi, interpret=True))
    )(U)
    assert bool(jnp.all(jnp.isfinite(g)))
