"""Mauna Loa composite-kernel study (`scrap.m` capability)."""
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_tpu.data import load_mauna
from gpt_tpu.experiments.mauna import NUM_HYPERS, composite_kernel, run_mauna
from gpt_tpu.models.exact_gp import ExactGP


@pytest.fixture(scope="module")
def mauna():
    x, y = load_mauna()
    return jnp.asarray(x), jnp.asarray(y)


def test_load_mauna_filters_missing(mauna):
    x, y = mauna
    assert x.shape == y.shape
    assert float(y.min()) > 0  # -99.99 sentinel rows dropped
    assert 1958 < float(x[0]) < 1959


def test_composite_forecast_beats_trend_extrapolation(mauna):
    """Fit on all-but-last-3-years, forecast the holdout: the optimised
    composite kernel must track both trend and seasonality — holdout RMSE
    well under the seasonal amplitude (~3 ppm) and far under a constant
    forecast."""
    x, y = mauna
    cut = x < float(x[-1]) - 3.0
    xt, yt = x[cut], y[cut]
    xs, ys = x[~cut], y[~cut]
    res = run_mauna(xt, yt, xs, max_steps=150)
    pred = res.mu + res.y_mean
    rmse = float(jnp.sqrt(jnp.mean((pred - ys) ** 2)))
    const_rmse = float(jnp.sqrt(jnp.mean((jnp.mean(yt) - ys) ** 2)))
    assert np.isfinite(float(res.opt.nlml))
    assert rmse < 1.5, rmse              # seasonal+trend captured
    assert rmse < 0.2 * const_rmse       # >> constant forecast
    # 2sigma band covers most holdout points
    inside = jnp.mean(
        (jnp.abs(pred - ys) < 2 * jnp.sqrt(res.var)).astype(jnp.float32)
    )
    assert float(inside) > 0.7


def test_composite_kernel_is_psd(mauna):
    x, _ = mauna
    h = jnp.ones((NUM_HYPERS,))
    K = composite_kernel(h)(x[:64, None], x[:64, None])
    evals = jnp.linalg.eigvalsh(K + 1e-8 * jnp.eye(64))
    # linear-kernel entries are ~year² ≈ 4e6, so PSD holds only relatively
    assert float(evals.min()) > -1e-8 * float(evals.max())


def test_composite_beats_plain_se_nlml(mauna):
    """The decomposition exists because one SE cannot explain CO2: at
    matched noise, the optimised composite NLML must beat a plain SE fit
    (the point of scrap.m's study)."""
    x, y = mauna
    x_, y_ = x[:300], y[:300]
    res = run_mauna(x_, y_, x_[:2], max_steps=120)

    from gpt_tpu.experiments.hyperlearning import learn_exact_gp_hyperparams
    se = learn_exact_gp_hyperparams(
        x_[:, None], y_ - jnp.mean(y_), jnp.ones((3,)), max_steps=120
    )
    assert float(res.opt.nlml) < float(se.nlml)
