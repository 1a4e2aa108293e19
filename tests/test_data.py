"""Dataset loader tests against the reference data files."""
import os

import numpy as np
import pytest

from gpt_tpu.data import (
    load_kin40k,
    load_movielens_100k,
    load_power_plant,
    load_segment,
    load_synth10000,
    load_tensor_synth,
    load_transfusion,
)

REF = "/root/reference"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF), reason="reference data not mounted")


@needs_ref
def test_power_plant_shapes_and_whitening():
    s = load_power_plant()
    assert s.X_train.shape == (5000, 4)
    assert s.X_test.shape == (4568, 4)
    np.testing.assert_allclose(s.X_train.mean(0), 0, atol=1e-10)
    np.testing.assert_allclose(s.X_train.std(0, ddof=1), 1, atol=1e-10)
    # y_std matches the reference's de-normalisation constant scale (~17)
    assert 15 < s.y_std < 19


@needs_ref
def test_kin40k_shapes():
    s = load_kin40k()
    assert s.X_train.shape == (10000, 8)
    assert s.X_test.shape == (30000, 8)
    np.testing.assert_allclose(s.y_train.mean(), 0, atol=1e-10)


@needs_ref
def test_synth10000():
    s = load_synth10000()
    assert s.X_train.shape == (5000, 4)
    assert s.y_std == 1.0


@needs_ref
def test_tensor_synth_ground_truth_consistency():
    """The stored phi/w/U/I must reproduce y at the smallest noise level."""
    from gpt_tpu.ops.contraction import tensor_predict
    import jax.numpy as jnp

    ts = load_tensor_synth(5)
    assert ts.I.shape == (32, 5) and ts.I.min() >= 0 and ts.I.max() < 2
    assert ts.U.shape == (5, 5, 2)
    # orthonormal factors
    UtU = np.einsum("dni,dnj->dij", ts.U, ts.U)
    np.testing.assert_allclose(UtU, np.broadcast_to(np.eye(2), (5, 2, 2)), atol=1e-8)
    fhat = tensor_predict(jnp.asarray(ts.w), jnp.asarray(ts.U), jnp.asarray(ts.I), jnp.asarray(ts.phi))
    resid = np.asarray(fhat) - ts.y[0.001]
    # y3 has noise VARIANCE 0.001 → sd ≈ 0.0316 (MakeSynthData.jl:12-13)
    assert 0.02 < np.sqrt((resid**2).mean()) < 0.045


@needs_ref
def test_classification_loaders():
    seg = load_segment()
    assert seg.num_classes == 7
    assert set(np.unique(seg.y_train)) <= set(range(7))
    tr = load_transfusion()
    assert tr.num_classes == 2
    assert tr.X_train.shape == (500, 4)


@needs_ref
def test_movielens_fold():
    ml = load_movielens_100k(1)
    assert ml.train.shape == (80000, 3)
    assert ml.test.shape == (20000, 3)
    assert ml.user_data.shape[0] == 943
    assert ml.movie_data.shape == (1682, 18)
    assert 0 <= ml.train[:, 0].min() and ml.train[:, 0].max() < 943
    assert abs(ml.train[:, 2].mean()) < 1e-10
    assert 1.0 < ml.rating_std < 1.3 and 3.4 < ml.rating_mean < 3.7


def test_movielens_1m_loader_with_synthetic_distribution(tmp_path):
    """Exercise the ml-1m loader on a synthetic copy of the distribution
    format (the real data is absent from the reference checkout)."""
    base = tmp_path / "ml-1m"
    base.mkdir()
    rng = np.random.default_rng(0)
    (base / "users.dat").write_text(
        "".join(f"{u+1}::{'MF'[u%2]}::{[1,18,25][u%3]}::{u%4}::0000\n" for u in range(6))
    )
    # movie ids sparse (1, 5, 9) to exercise remapping
    (base / "movies.dat").write_text(
        "1::A (1990)::Action|Comedy\n5::B (1991)::Drama\n9::C (1992)::Sci-Fi|War\n"
    )
    lines = []
    for _ in range(50):
        u = int(rng.integers(1, 7)); m = int(rng.choice([1, 5, 9])); r = int(rng.integers(1, 6))
        lines.append(f"{u}::{m}::{r}::978300760\n")
    (base / "ratings.dat").write_text("".join(lines))

    from gpt_tpu.data.movielens1m import load_movielens_1m

    fold = load_movielens_1m(str(tmp_path), n_train=40)
    assert fold.train.shape == (40, 3)
    assert fold.test.shape == (10, 3)
    assert fold.num_movies == 3
    assert set(np.unique(fold.train[:, 1])) <= {0.0, 1.0, 2.0}
    assert fold.movie_data.shape == (3, 18)
    assert fold.movie_data[0].sum() == 2  # Action|Comedy
    assert abs(fold.train[:, 2].mean()) < 1e-9


def test_movielens_1m_missing_raises():
    from gpt_tpu.data.movielens1m import load_movielens_1m

    with pytest.raises(FileNotFoundError, match="ml-1m"):
        load_movielens_1m("/nonexistent")
