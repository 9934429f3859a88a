"""Matplotlib/seaborn fit-visualization helpers.

Same five-function surface as the reference (src/dynode/utils/vis_utils.py,
which flags its own plots as dated -- vis_utils.py:22-23): model-overview
timeseries grids, posterior-correlation pairs, MCMC trace plots, prior
histograms, and prior-vs-posterior violins. All functions take plain dicts
of numpy/jax arrays and return the matplotlib Figure.
"""

from typing import Dict, List, Optional

import numpy as np

from .utils import drop_keys_with_substring, flatten_list_parameters


def _plt():
    import matplotlib

    matplotlib.use(matplotlib.get_backend() or "Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_model_overview_subplot_matplotlib(
    timeseries_by_region: Dict[str, Dict[str, np.ndarray]],
    plot_types: Optional[List[str]] = None,
    median_color: str = "C0",
    particle_alpha: float = 0.15,
):
    """Grid of region x metric timeseries.

    ``timeseries_by_region[region][metric]`` is ``(T,)`` or
    ``(particles, T)``; particle draws plot as thin lines with the median
    overlaid.
    """
    plt = _plt()
    regions = list(timeseries_by_region)
    metrics = plot_types or sorted(
        {m for reg in timeseries_by_region.values() for m in reg}
    )
    fig, axes = plt.subplots(
        len(regions),
        len(metrics),
        figsize=(4 * len(metrics), 2.5 * len(regions)),
        squeeze=False,
    )
    for i, region in enumerate(regions):
        for j, metric in enumerate(metrics):
            ax = axes[i][j]
            data = timeseries_by_region[region].get(metric)
            if data is None:
                ax.axis("off")
                continue
            arr = np.asarray(data)
            if arr.ndim == 1:
                ax.plot(arr, color=median_color)
            else:
                for row in arr:
                    ax.plot(row, color=median_color, alpha=particle_alpha, lw=0.5)
                ax.plot(np.median(arr, axis=0), color="k", lw=1.5)
            if i == 0:
                ax.set_title(metric)
            if j == 0:
                ax.set_ylabel(region)
    fig.tight_layout()
    return fig


def plot_checkpoint_inference_correlation_pairs(
    posteriors: Dict[str, np.ndarray],
    max_samples_calculated: int = 100,
):
    """Pairwise posterior scatter + correlation grid (flattens plated sites)."""
    plt = _plt()
    flat = flatten_list_parameters(
        {k: np.asarray(v) for k, v in posteriors.items()}
    )
    flat = drop_keys_with_substring(flat, "timestep")
    names = list(flat)
    cols = [np.asarray(v).reshape(-1)[:max_samples_calculated] for v in flat.values()]
    common = min(len(c) for c in cols)
    cols = [c[:common] for c in cols]
    n = len(names)
    fig, axes = plt.subplots(n, n, figsize=(2.2 * n, 2.2 * n), squeeze=False)
    for i in range(n):
        for j in range(n):
            ax = axes[i][j]
            if i == j:
                ax.hist(cols[i], bins=20, color="C0")
            elif i > j:
                ax.scatter(cols[j], cols[i], s=4, alpha=0.5)
            else:
                corr = np.corrcoef(cols[j], cols[i])[0, 1]
                ax.text(0.5, 0.5, f"{corr:.2f}", ha="center", va="center",
                        fontsize=12)
                ax.set_xticks([])
                ax.set_yticks([])
            if i == n - 1:
                ax.set_xlabel(names[j], fontsize=7)
            if j == 0:
                ax.set_ylabel(names[i], fontsize=7)
    fig.tight_layout()
    return fig


def plot_mcmc_chains(
    samples: Dict[str, np.ndarray],
    line_alpha: float = 0.8,
):
    """Trace plots: one panel per (flattened) site, one line per chain.

    ``samples`` values are (chains, draws, *plate).
    """
    plt = _plt()
    flat = flatten_list_parameters({k: np.asarray(v) for k, v in samples.items()})
    n = len(flat)
    ncols = min(3, max(n, 1))
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(4.5 * ncols, 2.2 * nrows), squeeze=False
    )
    for ax, (name, arr) in zip(axes.ravel(), flat.items()):
        arr = np.atleast_2d(np.asarray(arr))
        for c, chain in enumerate(arr):
            ax.plot(chain, alpha=line_alpha, lw=0.7, label=f"chain {c}")
        ax.set_title(name, fontsize=8)
    for ax in axes.ravel()[n:]:
        ax.axis("off")
    fig.tight_layout()
    return fig


def _sample_prior_distributions(priors: Dict, num_samples: int):
    """Draw ``num_samples`` from every Distribution leaf in a params dict."""
    import jax

    from ..dist import Distribution
    from ..utils.utils import identify_distribution_indexes

    idx_map = identify_distribution_indexes(priors)
    key = jax.random.PRNGKey(0)
    out = {}
    for site, where in idx_map.items():
        key, sub = jax.random.split(key)
        target = priors[where["sample_name"]]
        if where["sample_idx"] is not None:
            arr = np.array(target, dtype=object)
            target = arr[where["sample_idx"]]
        assert isinstance(target, Distribution)
        out[site] = np.asarray(target.sample(sub, (num_samples,)))
    return out


def plot_prior_distributions(
    priors: Dict,
    num_samples: int = 5000,
    hist_kwargs: Optional[dict] = None,
):
    """Histograms of sampled prior distributions found in a params dict."""
    plt = _plt()
    sampled = _sample_prior_distributions(priors, num_samples)
    n = max(len(sampled), 1)
    ncols = min(3, n)
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(4 * ncols, 2.5 * nrows), squeeze=False
    )
    for ax, (name, draws) in zip(axes.ravel(), sampled.items()):
        ax.hist(draws, bins=40, density=True, **(hist_kwargs or {}))
        ax.set_title(name, fontsize=8)
    for ax in axes.ravel()[len(sampled):]:
        ax.axis("off")
    fig.tight_layout()
    return fig


def plot_violin_plots(
    priors: Optional[Dict[str, np.ndarray]] = None,
    posteriors: Optional[Dict[str, np.ndarray]] = None,
):
    """Side-by-side prior vs posterior violins per site."""
    plt = _plt()
    priors = {k: np.asarray(v).reshape(-1) for k, v in (priors or {}).items()}
    posteriors = {
        k: np.asarray(v).reshape(-1) for k, v in (posteriors or {}).items()
    }
    names = sorted(set(priors) | set(posteriors))
    n = max(len(names), 1)
    ncols = min(3, n)
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(4 * ncols, 2.8 * nrows), squeeze=False
    )
    for ax, name in zip(axes.ravel(), names):
        data, labels = [], []
        if name in priors:
            data.append(priors[name])
            labels.append("prior")
        if name in posteriors:
            data.append(posteriors[name])
            labels.append("posterior")
        ax.violinplot(data, showmedians=True)
        ax.set_xticks(range(1, len(labels) + 1))
        ax.set_xticklabels(labels)
        ax.set_title(name, fontsize=8)
    for ax in axes.ravel()[len(names):]:
        ax.axis("off")
    fig.tight_layout()
    return fig


__all__ = [
    "plot_model_overview_subplot_matplotlib",
    "plot_checkpoint_inference_correlation_pairs",
    "plot_mcmc_chains",
    "plot_prior_distributions",
    "plot_violin_plots",
]
