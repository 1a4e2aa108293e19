"""Plotting utilities (L7).

Capability parity with the reference's figure layer: parameter traceplots
(``traceplot.jl``), RMSE learning curves (``lkhdLearningCurve.jl``,
``RMSEvsEps.jl``), and 2-D posterior surfaces (``Diagnostic_f_fhat.jl``,
``california/tensor2dplot.R``). Matplotlib with Agg backend; every function
returns the figure and optionally saves it.
"""
from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def traceplot(samples: np.ndarray, *, max_traces: int = 10, path: str | None = None,
              title: str = "parameter traces"):
    """Trace plot of sampled scalars; ``samples (T, k)`` or ``(chains, T, k)``.

    Reference: ``traceplot.jl`` / ``PowerPlantNoTensorExperiment.jl:70-84``.
    """
    plt = _plt()
    s = np.asarray(samples)
    if s.ndim == 2:
        s = s[None]
    C, T, k = s.shape
    k = min(k, max_traces)
    fig, axes = plt.subplots(1, k, figsize=(3 * k, 2.5), squeeze=False)
    for j in range(k):
        for c in range(C):
            axes[0, j].plot(s[c, :, j], lw=0.7)
        axes[0, j].set_xlabel("iteration")
    fig.suptitle(title)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
    return fig


def learning_curves(curves: dict[str, np.ndarray], *, ylabel: str = "test RMSE",
                    path: str | None = None, baseline: float | None = None,
                    x: np.ndarray | None = None, xlabel: str = "epoch",
                    logx: bool = False):
    """Metric curves for several configs on one axis.

    Reference: the per-n curves of ``PowerPlantNoTensorExperiment.jl:60-64``
    and the eps-sensitivity sweeps of ``RMSEvsEps.jl``. ``x`` gives explicit
    x-coordinates (default: epoch index); ``logx`` for scaling studies.
    """
    plt = _plt()
    fig, ax = plt.subplots(figsize=(5, 3.5))
    for name, ys in curves.items():
        xs = np.asarray(x) if x is not None else np.arange(len(np.asarray(ys)))
        ax.plot(xs, np.asarray(ys), label=str(name), marker="o" if x is not None else None)
    if baseline is not None:
        ax.axhline(baseline, color="k", ls="--", lw=0.8, label="baseline")
    if logx:
        ax.set_xscale("log", base=2)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.legend(fontsize=7)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
    return fig


def surface2d(x: np.ndarray, y: np.ndarray, f: np.ndarray, *, path: str | None = None,
              title: str = "posterior surface"):
    """Heatmap of a function over a 2-D grid (``Diagnostic_f_fhat.jl`` /
    the Bay-Area posterior maps of ``california/tensor2dplot.R``)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(4.5, 3.8))
    # f is flattened x-slowest (create_mesh_grid / fhatdraw ordering):
    # f[i·len(y)+j] = f(x_i, y_j) → reshape (nx, ny), transpose so rows
    # index y as pcolormesh expects. (A (len(y), len(x)) reshape renders
    # every asymmetric surface mirrored/scrambled.)
    im = ax.pcolormesh(np.asarray(x), np.asarray(y),
                       np.asarray(f).reshape(len(x), len(y)).T, shading="auto")
    fig.colorbar(im, ax=ax)
    ax.set_title(title)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
    return fig
