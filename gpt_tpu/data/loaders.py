"""Dataset loaders (L5 data layer).

Loads every dataset the reference's experiment drivers consume, with the same
split and standardisation conventions, as plain numpy arrays (device placement
happens at the experiment layer). Default root is the read-only reference
checkout; pass ``root`` to point elsewhere.

Conventions (matching the reference drivers):

- Standardisation uses *train* statistics for both train and test
  (``PowerPlantNoTensorExperiment.jl:18-27``, ``kin40kExperiment.jl:25-36``);
  reported RMSEs are de-normalised by ``y_train_std``.
- Power Plant: first 5000 rows train, remainder test, no shuffle
  (``PowerPlantNoTensorExperiment.jl:8-16``).
- MovieLens-100k: the distribution's ``u{1..5}.base/.test`` 80k/20k folds
  (``100k_movielensExperiment.jl:556-560``).
"""
from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

REFERENCE_ROOT = os.environ.get("GPT_TPU_DATA_ROOT", "/root/reference")


def _load_dense(path: str, cols: int, *, sep: str = " ", skip_header: int = 0) -> np.ndarray:
    """Dense numeric text file via the native fast loader when built
    (``native/libfastload.so``), numpy otherwise."""
    from gpt_tpu.data import native_loader

    if native_loader.available():
        return native_loader.load_matrix(path, cols, sep=sep, skip_header=skip_header)
    if sep == ",":
        return np.genfromtxt(path, delimiter=",", skip_header=skip_header)
    return np.loadtxt(path, skiprows=skip_header)


from gpt_tpu.utils.math import Whitening


def _load_ratings_file(path: str) -> np.ndarray:
    from gpt_tpu.data import native_loader

    if native_loader.available():
        return native_loader.load_ratings(path)
    return np.loadtxt(path)[:, :3]


class RegressionSplit(NamedTuple):
    """A standardised train/test regression problem.

    ``X*``/``y*`` are already whitened with train statistics; ``y_std`` (the
    raw train-label sd, a python float) de-normalises RMSEs.
    """

    X_train: np.ndarray
    y_train: np.ndarray
    X_test: np.ndarray
    y_test: np.ndarray
    y_mean: float
    y_std: float
    x_stats: Whitening


def standardize_split(X_train, y_train, X_test, y_test) -> RegressionSplit:
    """Whiten with train statistics (ddof=1, matching Julia's ``std``)."""
    X_train = np.asarray(X_train, np.float64)
    X_test = np.asarray(X_test, np.float64)
    y_train = np.asarray(y_train, np.float64).ravel()
    y_test = np.asarray(y_test, np.float64).ravel()
    xm, xs = X_train.mean(0), X_train.std(0, ddof=1)
    ym, ys = float(y_train.mean()), float(y_train.std(ddof=1))
    return RegressionSplit(
        X_train=(X_train - xm) / xs,
        y_train=(y_train - ym) / ys,
        X_test=(X_test - xm) / xs,
        y_test=(y_test - ym) / ys,
        y_mean=ym,
        y_std=ys,
        x_stats=Whitening(xm, xs),
    )


def load_power_plant(root: str = REFERENCE_ROOT, n_train: int = 5000) -> RegressionSplit:
    """UCI Combined-Cycle Power Plant: N=9568, D=4, target PE.

    Reference: ``Folds5x2_pp.csv`` consumed by
    ``PowerPlantNoTensorExperiment.jl:5-27`` (first ``n_train`` rows train).
    """
    path = os.path.join(root, "Folds5x2_pp.csv")
    data = _load_dense(path, 5, sep=",", skip_header=1)
    X, y = data[:, :4], data[:, 4]
    return standardize_split(X[:n_train], y[:n_train], X[n_train:], y[n_train:])


def load_kin40k(root: str = REFERENCE_ROOT) -> RegressionSplit:
    """kin40k: 10k train / 30k test, D=8 (``kin40kExperiment.jl:11-14``)."""
    def rd(name, cols):
        return _load_dense(os.path.join(root, name), cols)

    return standardize_split(
        rd("kin40k_train_data.txt", 8), rd("kin40k_train_labels.txt", 1),
        rd("kin40k_test_data.txt", 8), rd("kin40k_test_labels.txt", 1),
    )


def load_synth10000(root: str = REFERENCE_ROOT) -> RegressionSplit:
    """10000SynthData.h5: 5k/5k split, D=4, already whitened in-file.

    Reference: consumed by ``PowerPlantDataExperiment.jl`` and
    ``DataRecords.txt:2-14`` experiments. Julia h5 arrays arrive transposed.
    """
    import h5py

    with h5py.File(os.path.join(root, "10000SynthData.h5"), "r") as h:
        Xtr = np.array(h["Xtrain"]).T
        Xte = np.array(h["Xtest"]).T
        ytr = np.array(h["ytrain"])
        yte = np.array(h["ytest"])
    # Already standardised when written; y_std=1 keeps RMSEs in file units.
    return RegressionSplit(Xtr, ytr, Xte, yte, 0.0, 1.0, Whitening(Xtr.mean(0), Xtr.std(0)))


class TensorSynth(NamedTuple):
    """Posterior-recovery fixture: data drawn from the tensor model itself.

    Reference: ``MakeSynthData.jl`` → ``TensorSynthData{5D,10D}100N.h5`` with
    ground-truth (w, U, I) and three noise *variances* y1/y2/y3
    (σ² = 0.1/0.01/0.001, i.e. noise sd √0.001 ≈ 0.0316 for y3).
    """

    X: np.ndarray  # (N, D)
    phi: np.ndarray  # (N, D, n) — features used at generation time
    y: dict  # noise variance -> (N,)
    w: np.ndarray  # (Q,)
    U: np.ndarray  # (D, n, r)
    I: np.ndarray  # (Q, D) 0-based
    length_scale: np.ndarray


def load_tensor_synth(dims: int = 5, root: str = REFERENCE_ROOT) -> TensorSynth:
    import h5py

    name = f"TensorSynthData{dims}D100N.h5"
    with h5py.File(os.path.join(root, name), "r") as h:
        X = np.array(h["X"]).T  # (N, D)
        phi = np.array(h["phi"])  # Julia (n, D, N) reads back as (N, D, n)
        w = np.array(h["w"])
        U = np.array(h["U"])
        I = np.array(h["I"]).T  # (Q, D), 1-based in file
        ls = np.array(h["length_scale"])
        y = {0.1: np.array(h["y1"]), 0.01: np.array(h["y2"]), 0.001: np.array(h["y3"])}
    # U was written (n, r, D) → reads (D, r, n); transpose to (D, n, r).
    U = np.transpose(U, (0, 2, 1))
    return TensorSynth(X=X, phi=phi, y=y, w=w, U=U, I=(I - 1).astype(np.int32), length_scale=ls)


class ClassificationSplit(NamedTuple):
    X_train: np.ndarray
    y_train: np.ndarray  # int labels in [0, C)
    X_test: np.ndarray
    y_test: np.ndarray
    num_classes: int
    x_stats: Whitening


def _standardize_classification(Xtr, ytr, Xte, yte, C) -> ClassificationSplit:
    xm, xs = Xtr.mean(0), Xtr.std(0, ddof=1)
    xs = np.where(xs == 0, 1.0, xs)  # constant columns (segment.dat col 3)
    return ClassificationSplit(
        (Xtr - xm) / xs, ytr.astype(np.int32), (Xte - xm) / xs, yte.astype(np.int32),
        C, Whitening(xm, xs),
    )


def load_segment(root: str = REFERENCE_ROOT, n_train: int = 1300, seed: int = 17) -> ClassificationSplit:
    """UCI image segmentation: 2310 rows, 19 features, 7 classes.

    Reference: ``segment.dat`` consumed by ``ImageExperiment.jl`` (D=16 after
    dropping the three constant/degenerate columns; we keep all non-constant
    columns and standardise — constant columns get unit scale).
    """
    data = np.loadtxt(os.path.join(root, "segment.dat"))
    X, y = data[:, :-1], data[:, -1].astype(int) - 1
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(y))
    tr, te = perm[:n_train], perm[n_train:]
    return _standardize_classification(X[tr], y[tr], X[te], y[te], 7)


def load_transfusion(root: str = REFERENCE_ROOT, n_train: int = 500, seed: int = 17) -> ClassificationSplit:
    """UCI blood transfusion: 748 rows, D=4, binary.

    Reference: ``transfusion.data`` consumed by
    ``BloodTransfusionExperiment.jl`` (Ntrain=500).
    """
    data = np.genfromtxt(os.path.join(root, "transfusion.data"), delimiter=",", skip_header=1)
    X, y = data[:, :4], data[:, 4].astype(int)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(y))
    tr, te = perm[:n_train], perm[n_train:]
    return _standardize_classification(X[tr], y[tr], X[te], y[te], 2)


class MovieLensFold(NamedTuple):
    """One ML-100k fold with z-scored ratings and side information.

    Reference prep: ``100k_movielensExperiment.jl:556-609`` — ratings z-scored
    with train statistics; user side info = gender, age quantile-bin (one-hot
    of 6), occupation one-hot; movie side info = 18 genre flags.
    """

    train: np.ndarray  # (Ntr, 3) [user, movie, rating_z] — user/movie 0-based
    test: np.ndarray  # (Nte, 3)
    user_data: np.ndarray  # (943, Du) binary side info
    movie_data: np.ndarray  # (1682, Dm)
    rating_mean: float
    rating_std: float
    num_users: int
    num_movies: int


def load_movielens_100k(fold: int | str = 1, root: str = REFERENCE_ROOT) -> MovieLensFold:
    """Load one ML-100k split.

    ``fold`` 1..5 → the distribution's ``u{fold}.base``/``u{fold}.test``
    80k/20k folds (``100k_movielensExperiment.jl:563-566``). ``fold="file"``
    → the *file-order* split of ``u.data`` (first 80k train, last 20k test),
    which is the split the reference's BayesPMF head-to-head uses
    (``100k_movielensExperiment.jl:1188-1191``: ``Rating = readdlm("ml-100k/u.data")``;
    ``Ratingtest = Rating[Ntrain+1:Ntrain+Ntest,:]`` with Ntrain=80000) —
    ``bayespmf_pred.h5`` rows align with that test set, NOT with u1.test.
    """
    base = os.path.join(root, "ml-100k")
    if fold == "file":
        all_ratings = _load_ratings_file(os.path.join(base, "u.data")).astype(np.int64)
        tr, te = all_ratings[:80000], all_ratings[80000:100000]
    else:
        tr = _load_ratings_file(os.path.join(base, f"u{fold}.base")).astype(np.int64)
        te = _load_ratings_file(os.path.join(base, f"u{fold}.test")).astype(np.int64)
    mean = float(tr[:, 2].mean())
    std = float(tr[:, 2].std(ddof=1))

    def z(arr):
        out = np.zeros((len(arr), 3))
        out[:, 0] = arr[:, 0] - 1
        out[:, 1] = arr[:, 1] - 1
        out[:, 2] = (arr[:, 2] - mean) / std
        return out

    # user side info: age (quantile-binned, 6 bins), gender, occupation one-hot
    users = np.genfromtxt(
        os.path.join(base, "u.user"), delimiter="|", dtype=str
    )  # id | age | gender | occupation | zip
    ages = users[:, 1].astype(int)
    qs = np.quantile(ages, np.linspace(0, 1, 7)[1:-1])
    age_bin = np.digitize(ages, qs)  # 0..5
    age_oh = np.eye(6)[age_bin]
    gender = (users[:, 2] == "M").astype(float)[:, None]
    occs = sorted(set(users[:, 3]))
    occ_oh = np.eye(len(occs))[[occs.index(o) for o in users[:, 3]]]
    user_data = np.concatenate([gender, age_oh, occ_oh], axis=1)

    # movie side info: 19 genre flags (incl. "unknown"); drop "unknown" to
    # match the reference's 18 genres (1m_movielensExperiment.jl:918-927)
    with open(os.path.join(base, "u.item"), encoding="latin-1") as f:
        rows = [line.rstrip("\n").split("|") for line in f]
    genres = np.array([[int(v) for v in r[-19:]] for r in rows], dtype=float)
    movie_data = genres[:, 1:]

    return MovieLensFold(
        train=z(tr),
        test=z(te),
        user_data=user_data,
        movie_data=movie_data,
        rating_mean=mean,
        rating_std=std,
        num_users=943,
        num_movies=1682,
    )


def load_mauna(root: str = REFERENCE_ROOT):
    """Mauna Loa monthly CO2: (year_frac, ppm), missing values dropped.

    Reference: ``mauna.txt`` consumed by the GPstuff composite-kernel study
    ``scrap.m:7-9`` (``z = mauna(:,2) ~= -99.99``).
    """
    import numpy as np

    data = np.loadtxt(os.path.join(root, "mauna.txt"))
    keep = data[:, 1] != -99.99
    return data[keep, 0], data[keep, 1]
