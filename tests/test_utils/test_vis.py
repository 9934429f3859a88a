"""Smoke tests for the visualization helpers (Agg backend)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

import dynode_tpu.dist as dist
from dynode_tpu.utils import vis_utils


def test_model_overview_grid():
    ts = {"US": {"cases": np.random.rand(5, 30), "hosp": np.random.rand(30)}}
    fig = vis_utils.plot_model_overview_subplot_matplotlib(ts)
    assert len(fig.axes) == 2


def test_correlation_pairs():
    post = {"r0": np.random.rand(50), "gamma": np.random.rand(50, 3)}
    fig = vis_utils.plot_checkpoint_inference_correlation_pairs(post)
    assert len(fig.axes) >= 4


def test_mcmc_chains():
    samples = {"r0": np.random.rand(4, 100), "period": np.random.rand(4, 100)}
    fig = vis_utils.plot_mcmc_chains(samples)
    assert len(fig.axes) >= 2


def test_prior_distributions():
    priors = {"r0": dist.Normal(2.0, 0.2), "lst": [0.0, dist.Beta(2.0, 2.0)]}
    fig = vis_utils.plot_prior_distributions(priors, num_samples=200)
    assert len(fig.axes) >= 2


def test_violin_plots():
    fig = vis_utils.plot_violin_plots(
        priors={"r0": np.random.rand(100)},
        posteriors={"r0": np.random.rand(100) + 1},
    )
    assert len(fig.axes) >= 1


def test_lazy_export_via_utils_namespace():
    import dynode_tpu.utils as u

    assert callable(u.plot_mcmc_chains)
    with pytest.raises(AttributeError):
        u.not_a_function
