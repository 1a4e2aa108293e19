"""Diagnostics tests: frequency-RMSE breakdown + kernel-approximation study."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_tpu.diagnostics.cf_analysis import (
    FreqRMSE,
    entity_frequencies,
    load_bayespmf_predictions,
    rmse_by_frequency,
)
from gpt_tpu.diagnostics.kernel_approx import (
    compare_gram,
    nystrom_gram,
    rff_convergence_study,
    rff_gram,
    svd_gram,
)
from gpt_tpu.inference.hyper import se_ard_kernel

needs_ref = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference data not mounted"
)


def test_entity_frequencies():
    f = entity_frequencies(np.array([0, 0, 2, 1, 0]), 4)
    np.testing.assert_array_equal(f, [3, 1, 1, 0])


def test_rmse_by_frequency_groups():
    train_freq = np.array([5, 1, 0])
    test_ids = np.array([0, 0, 1, 2])
    errors = np.array([1.0, 3.0, 2.0, 4.0])
    out = rmse_by_frequency(test_ids, errors, train_freq)
    np.testing.assert_array_equal(out.freqs, [0, 1, 5])
    np.testing.assert_allclose(out.rmse[2], np.sqrt((1 + 9) / 2))  # freq-5 group
    np.testing.assert_allclose(out.rmse[1], 2.0)
    np.testing.assert_allclose(out.rmse[0], 4.0)


def test_rmse_by_frequency_binned():
    train_freq = np.arange(100)
    test_ids = np.arange(100)
    errors = np.ones(100)
    out = rmse_by_frequency(test_ids, errors, train_freq, bins=np.array([0, 10, 50]))
    np.testing.assert_array_equal(out.counts, [10, 40, 50])
    np.testing.assert_allclose(out.rmse, np.ones(3))


@needs_ref
def test_bayespmf_predictions_loadable():
    pred = load_bayespmf_predictions()
    assert pred.shape == (20000,)
    assert 1.0 <= pred.mean() <= 5.0


def test_svd_beats_rff_beats_nothing(key):
    """Ordering sanity on a small SE Gram: best-rank-m ≤ Nyström ≲ RFF error;
    the reference's study shows exactly this ordering
    (``Plots/ppfull_plot.png``)."""
    kx, ky, kf = jax.random.split(key, 3)
    X = jax.random.normal(kx, (80, 3))
    y = jax.random.normal(ky, (80,))
    K = se_ard_kernel(X, X, 1.0, 1.0)
    m = 20
    r_svd = compare_gram(K, svd_gram(K, m), y, 0.1)
    r_nys = compare_gram(K, nystrom_gram(K, jnp.arange(m)), y, 0.1)
    r_rff = compare_gram(K, rff_gram(kf, X, m, 1.0, 1.0), y, 0.1)
    assert float(r_svd.frobenius_rel) <= float(r_nys.frobenius_rel) + 1e-6
    assert float(r_svd.frobenius_rel) < float(r_rff.frobenius_rel)


def test_fic_pic_improve_on_nystrom(key):
    """FIC fixes the diagonal, PIC additionally fixes diagonal blocks —
    monotone error improvement over plain Nyström (the
    ``powerplant_hyperparams.m`` FIC/PIC rows, ``blockdiag.m`` helper)."""
    from gpt_tpu.diagnostics.kernel_approx import (
        block_diag_extract, fic_gram, pic_gram,
    )

    kx, ky = jax.random.split(key)
    X = jax.random.normal(kx, (80, 3))
    y = jax.random.normal(ky, (80,))
    K = se_ard_kernel(X, X, 1.0, 1.0)
    idx = jnp.arange(16)
    r_nys = compare_gram(K, nystrom_gram(K, idx), y, 0.1)
    r_fic = compare_gram(K, fic_gram(K, idx), y, 0.1)
    r_pic = compare_gram(K, pic_gram(K, idx, block_size=10), y, 0.1)
    assert float(r_fic.frobenius_rel) < float(r_nys.frobenius_rel)
    assert float(r_pic.frobenius_rel) < float(r_fic.frobenius_rel)
    # FIC diagonal is exact; PIC blocks are exact
    import numpy as np
    np.testing.assert_allclose(
        np.diagonal(fic_gram(K, idx)), np.diagonal(K), rtol=1e-6
    )
    blk = block_diag_extract(K, 10)
    np.testing.assert_allclose(
        np.asarray(block_diag_extract(pic_gram(K, idx, 10), 10)),
        np.asarray(blk), rtol=1e-5, atol=1e-6,
    )


def test_rff_convergence_decreases(key):
    kx, ky = jax.random.split(key)
    X = jax.random.normal(kx, (60, 2))
    y = jax.random.normal(ky, (60,))
    study = rff_convergence_study(key, X, y, 1.0, 1.0, 0.1, ms=(50, 800), num_seeds=2)
    assert study[800][0] < study[50][0]


def test_plots_smoke(tmp_path, key):
    """Plot utilities render and save without a display."""
    import numpy as np

    from gpt_tpu.diagnostics.plots import learning_curves, surface2d, traceplot

    f1 = traceplot(np.random.default_rng(0).normal(size=(2, 50, 3)),
                   path=str(tmp_path / "t.png"))
    f2 = learning_curves({"a": np.linspace(5, 4, 20)}, baseline=4.0,
                         path=str(tmp_path / "c.png"))
    f3 = surface2d(np.linspace(0, 1, 4), np.linspace(0, 1, 5),
                   np.arange(20.0), path=str(tmp_path / "s.png"))
    import os
    for n in ["t.png", "c.png", "s.png"]:
        assert os.path.getsize(tmp_path / n) > 1000


@needs_ref
def test_bayespmf_alignment_with_udata_file_split():
    """bayespmf_pred.h5 rows align with the file-order u.data tail (the
    reference's split at 100k_movielensExperiment.jl:1188-1191), NOT u1.test —
    the round-1 'unrecoverable ordering' claim was a wrong-split artifact."""
    import numpy as np

    from gpt_tpu.data import load_movielens_100k
    from gpt_tpu.diagnostics.cf_analysis import (
        bayespmf_head_to_head,
        load_bayespmf_predictions,
    )

    fold = load_movielens_100k("file")
    bpmf = load_bayespmf_predictions()
    y_raw = fold.test[:, 2] * fold.rating_std + fold.rating_mean
    corr = float(np.corrcoef(y_raw, bpmf)[0, 1])
    rmse = float(np.sqrt(np.mean((y_raw - bpmf) ** 2)))
    assert corr > 0.55, f"alignment lost: corr={corr}"
    assert 0.85 < rmse < 0.95, f"BPMF RMSE off: {rmse}"

    # head-to-head machinery runs end-to-end with a constant predictor
    const = np.full(len(y_raw), fold.rating_mean)
    hh = bayespmf_head_to_head(fold, const)
    assert hh["rmse_bpmf"] < hh["rmse_ours"]  # BPMF beats predicting the mean
    for k in ("user_ours", "user_bpmf", "movie_ours", "movie_bpmf"):
        assert np.isfinite(hh[k].rmse[np.asarray(hh[k].counts) > 0]).all()
