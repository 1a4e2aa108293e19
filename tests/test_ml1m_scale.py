"""Synthetic ML-1M-shaped data: format parity + small-scale training flow."""
import jax
import jax.numpy as jnp
import numpy as np

from gpt_tpu.data import make_synthetic_ml1m
from gpt_tpu.experiments import configs as C
from gpt_tpu.experiments.movielens import run_movielens


def test_synthetic_ml1m_shape_and_format():
    fold = make_synthetic_ml1m(num_users=200, num_movies=120,
                               num_ratings=5000, n_train=4000)
    assert fold.train.shape == (4000, 3)
    assert fold.test.shape == (1000, 3)
    assert fold.user_data.shape[0] == 200
    assert fold.movie_data.shape == (120, 18)
    assert 0 <= fold.train[:, 0].min() and fold.train[:, 0].max() < 200
    assert 0 <= fold.train[:, 1].min() and fold.train[:, 1].max() < 120
    # z-scored ratings
    assert abs(float(fold.train[:, 2].mean())) < 1e-6
    assert 1.0 <= fold.rating_mean <= 5.0


def test_synthetic_ml1m_trains_below_constant_predictor():
    fold = make_synthetic_ml1m(num_users=300, num_movies=150,
                               num_ratings=20000, n_train=16000, r=5)
    run = run_movielens(fold, C.MOVIELENS_100K, jax.random.PRNGKey(0),
                        maxepoch=20)
    y_raw = fold.test[:, 2] * fold.rating_std + fold.rating_mean
    const = float(np.sqrt(np.mean((y_raw - fold.rating_mean) ** 2)))
    assert run.best_rmse < 0.97 * const
    assert run.rejected == 0
