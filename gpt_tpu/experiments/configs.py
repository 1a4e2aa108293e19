"""Per-dataset configuration presets.

The reference hard-codes tuned hyperparameters as ``@everywhere const``
globals at the top of each experiment script (SURVEY.md §5 "Config / flag
system"); these dataclasses mirror those constants 1:1 so every cited
experiment is reproducible from a named preset.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class FullThetaPreset:
    """No-tensor (full-theta) SGLD experiment configuration."""

    n: int
    m: int
    eps_theta: float
    length_scale: Sequence[float] | float
    sigma_RBF: float
    signal_var: float
    sigma_theta: float = 1.0
    decay: float = 0.0
    burnin: int = 0
    maxepoch: int = 100
    avg_start: int = 60  # averaged-prediction window start (1-based epoch)


@dataclasses.dataclass(frozen=True)
class TensorPreset:
    """Tensor-GP SGLD experiment configuration."""

    n: int
    r: int
    Q: int
    m: int
    epsw: float
    epsU: float
    length_scale: Sequence[float] | float
    sigma_RBF: float
    signal_var: float
    burnin: int = 0
    maxepoch: int = 100
    avg_last: int = 50  # average predictions over the last k epoch-ends


# Power Plant no-tensor — PowerPlantNoTensorExperiment.jl:8-39
POWER_PLANT_NOTENSOR = FullThetaPreset(
    n=2000,
    m=50,
    eps_theta=1.1e-4,
    length_scale=1.4332,
    sigma_RBF=1.0,
    signal_var=0.2299**2,
    maxepoch=100,
    avg_start=60,
)

# Power Plant tensor — DataRecords.txt:20-21,38 configs
POWER_PLANT_TENSOR_SMALL = TensorPreset(
    n=100, r=10, Q=100, m=100, epsw=1e-4, epsU=1e-7,
    length_scale=1.4332, sigma_RBF=1.0, signal_var=0.2299**2,
    burnin=90, maxepoch=10,
)
POWER_PLANT_TENSOR = TensorPreset(
    n=150, r=20, Q=200, m=50, epsw=1e-4, epsU=1e-7,
    length_scale=1.4332, sigma_RBF=1.0, signal_var=0.2299**2,
    burnin=90, maxepoch=10,
)

# kin40k no-tensor — kin40kNoTensorExperiment.jl:34-46
KIN40K_NOTENSOR = FullThetaPreset(
    n=8000, m=50, eps_theta=2e-4,
    length_scale=(2.5242, 2.3376, 1.3630, 1.4949, 1.6022, 1.1366, 1.1964, 1.7028),
    sigma_RBF=1.0420, signal_var=0.0476,
    maxepoch=100, avg_start=60,
)

# kin40k tensor — kin40kExperiment.jl:20-52
KIN40K_TENSOR = TensorPreset(
    n=150, r=20, Q=200, m=50, epsw=1e-4, epsU=1e-7,
    length_scale=(2.5242, 2.3376, 1.3630, 1.4949, 1.6022, 1.1366, 1.1964, 1.7028),
    sigma_RBF=1.0420, signal_var=0.0476,
    burnin=150, maxepoch=50, avg_last=50,
)

# Synthetic tensor data — SynthDataExperiment.jl:26-44
SYNTH_TENSOR = TensorPreset(
    n=5, r=2, Q=32, m=10, epsw=1e-5, epsU=1e-8,
    length_scale=1.0, sigma_RBF=1.0, signal_var=0.01,
    burnin=250, maxepoch=50,
)


@dataclasses.dataclass(frozen=True)
class MovieLensPreset:
    """MovieLens CF configuration — 100k_movielensExperiment.jl:729-739."""

    r: int = 15
    m: int = 100
    signal_var: float = 0.8
    sigma_u: float = 0.1
    sigma_w: float = 1.0
    epsw: float = 1e-4
    epsU: float = 1e-6
    a: float = 0.5  # hashed-block scale
    b: float = 0.25  # user side-info weight
    c: float = 0.5  # movie side-info weight
    n_hash: int = 0  # hashing dims (0 = pure index model)
    M_hash: int = 5
    burnin: int = 0
    maxepoch: int = 200


MOVIELENS_100K = MovieLensPreset()
