"""History plotting — ``plothistory`` equivalent (reference src/debug.jl:1-8,
which renders the primal-residual history on a log scale; requires a
plotting backend and is likewise not imported into the package build)."""

from __future__ import annotations


def plothistory(history, key: str = "p", ax=None, **plot_kwargs):
    """Semilog plot of a history series (default: primal residual ``p``)."""
    if ax is None:
        import matplotlib.pyplot as plt

        _, ax = plt.subplots()
    iters, vals = history.get(key)
    ax.semilogy(iters, vals, **plot_kwargs)
    ax.set_xlabel("iteration")
    ax.set_ylabel(key)
    ax.grid(True, which="both", alpha=0.3)
    return ax
