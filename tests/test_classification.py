"""Classification experiment tests (reduced configs)."""
import os

import jax
import pytest

from gpt_tpu.data import load_segment, load_transfusion
from gpt_tpu.experiments.classification import (
    run_fulltheta_classification,
    run_tensor_classification,
)

needs_ref = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference data not mounted"
)


@needs_ref
def test_segment_fulltheta_beats_chance():
    seg = load_segment()
    run = run_fulltheta_classification(
        seg, jax.random.PRNGKey(0), n=100, eps_theta=1e-3, maxepoch=15
    )
    assert run.rejected == 0
    assert run.best_error < 0.5  # chance = 6/7 ≈ 0.857
    assert run.mean_nlp[-1] < 1.9  # chance nlp = log 7 ≈ 1.95


@needs_ref
def test_segment_tensor_beats_chance():
    seg = load_segment()
    run = run_tensor_classification(
        seg, jax.random.PRNGKey(0), n=5, r=10, Q=100,
        epsw=3e-4, epsU=3e-5, maxepoch=30,
    )
    assert run.rejected == 0
    assert run.best_error < 0.7  # chance = 6/7 ≈ 0.857; full config reaches ~0.26


@needs_ref
def test_transfusion_binary():
    tr = load_transfusion()
    run = run_fulltheta_classification(
        tr, jax.random.PRNGKey(0), n=200, eps_theta=1e-3, maxepoch=20
    )
    # majority class baseline ≈ 0.24; must at least match it closely
    assert run.best_error < 0.30


def test_r_bigger_than_n_stiefel_raises(key):
    from gpt_tpu.utils import stiefel

    with pytest.raises(ValueError, match="r <= n"):
        stiefel.sample_stiefel(key, 5, 10)
