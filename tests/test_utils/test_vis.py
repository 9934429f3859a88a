"""Content-level tests for the visualization helpers (Agg backend).

Assert panel counts, line counts, labels — not just "a figure exists" —
mirroring the behavior contract of the reference's vis layer
(/root/reference/src/dynode/utils/vis_utils.py:64-699).
"""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest

import dynode_tpu.dist as dist
from dynode_tpu.utils import vis_utils
from dynode_tpu.utils.vis_utils import VisualizationError


def _overview_df(regions=("US", "EU"), particles=4, days=20):
    rng = np.random.default_rng(0)
    rows = []
    dates = pd.date_range("2022-02-11", periods=days)
    for region in regions:
        for p in range(particles):
            for d, date in enumerate(dates):
                rows.append(
                    {
                        "date": date,
                        "chain_particle": f"0_{p}",
                        "region": region,
                        "total_infection_incidence": float(
                            rng.random() + d
                        ),
                        "vaccination_0_17": float(rng.random()),
                        "vaccination_18_49": float(rng.random()),
                    }
                )
    return pd.DataFrame(rows)


class TestModelOverview:
    def test_grid_shape_rows_metrics_cols_regions(self):
        df = _overview_df()
        fig = vis_utils.plot_model_overview_subplot_matplotlib(
            df, pop_sizes={"US": 1000, "EU": 2000}
        )
        # 2 metric families present (incidence, vaccination_) x 2 regions
        assert len(fig.axes) == 4

    def test_particle_lines_plus_median(self):
        df = _overview_df(regions=("US",), particles=4)
        fig = vis_utils.plot_model_overview_subplot_matplotlib(
            df, pop_sizes={"US": 1000}
        )
        # incidence panel: 4 thin particle lines + 1 median line
        incidence_ax = [
            ax for ax in fig.axes if "incidence" in ax.get_title()
        ][0]
        assert len(incidence_ax.lines) == 5
        # vaccination panel: 2 columns x (4 particles + 1 median) = 10
        vax_ax = [ax for ax in fig.axes if "vaccination" in ax.get_title()][0]
        assert len(vax_ax.lines) == 10

    def test_normalization_scales_values(self):
        df = _overview_df(regions=("US",), particles=1)
        raw_max = df["total_infection_incidence"].max()
        fig = vis_utils.plot_model_overview_subplot_matplotlib(
            df,
            pop_sizes={"US": 1000},
            plot_types=np.array(["total_infection_incidence"]),
            plot_titles=np.array(["incidence per 100k"]),
            plot_normalizations=np.array([100_000]),
        )
        ax = fig.axes[0]
        ydata = np.concatenate([ln.get_ydata() for ln in ax.lines])
        assert np.nanmax(ydata) == pytest.approx(raw_max * 100, rel=1e-6)

    def test_missing_required_column_raises(self):
        df = _overview_df().drop(columns=["chain_particle"])
        with pytest.raises(AssertionError, match="necessary column"):
            vis_utils.plot_model_overview_subplot_matplotlib(
                df, pop_sizes={"US": 1000, "EU": 2000}
            )

    def test_absent_plot_types_skipped(self):
        df = _overview_df(regions=("US",))
        fig = vis_utils.plot_model_overview_subplot_matplotlib(
            df,
            pop_sizes={"US": 1000},
            plot_types=np.array(
                ["total_infection_incidence", "pred_hosp_"]
            ),
            plot_titles=np.array(["inc", "hosp"]),
            plot_normalizations=np.array([1, 1]),
        )
        assert len(fig.axes) == 1  # pred_hosp_ absent -> skipped


class TestCorrelationPairs:
    def test_n_by_n_grid_with_flattened_plates(self):
        post = {
            "r0": np.random.rand(2, 50),
            "gamma": np.random.rand(2, 50, 3),
        }
        fig = vis_utils.plot_checkpoint_inference_correlation_pairs(post)
        # r0 + gamma_0..2 = 4 sites -> 4x4 grid
        assert len(fig.axes) == 16

    def test_timestep_sites_dropped(self):
        post = {
            "r0": np.random.rand(2, 50),
            "final_timestep_s": np.random.rand(2, 50),
        }
        with pytest.raises(VisualizationError):
            # only timestep left after dropping r0? no -- r0 remains: 1x1
            fig = vis_utils.plot_checkpoint_inference_correlation_pairs(
                {"final_timestep_s": post["final_timestep_s"]}
            )
            del fig
        fig = vis_utils.plot_checkpoint_inference_correlation_pairs(post)
        assert len(fig.axes) == 1

    def test_subsample_cap(self):
        post = {"a": np.random.rand(2, 500), "b": np.random.rand(2, 500)}
        fig = vis_utils.plot_checkpoint_inference_correlation_pairs(
            post, max_samples_calculated=10
        )
        # lower-triangle scatter holds 2 chains x 10 draws = 20 points
        scatter_ax = fig.axes[2]
        assert scatter_ax.collections[0].get_offsets().shape[0] == 20

    def test_correlation_uses_full_posterior_despite_scatter_cap(self):
        # the cap thins only the RENDERED points; the annotated correlation
        # must come from all draws (a 10-draw subsample of this posterior
        # would give a visibly different r than the full 2x2000)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 2000))
        y = 0.6 * x + 0.8 * rng.standard_normal((2, 2000))
        full_r = np.corrcoef(x.ravel(), y.ravel())[0, 1]
        fig = vis_utils.plot_checkpoint_inference_correlation_pairs(
            {"a": x, "b": y}, max_samples_calculated=10
        )
        upper_ax = fig.axes[1]
        shown = float(upper_ax.texts[0].get_text())
        assert abs(shown - full_r) < 0.006  # annotation rounds to 2 dp

    def test_correlation_annotation_present(self):
        x = np.random.rand(2, 50)
        post = {"a": x, "b": 2 * x + 0.01 * np.random.rand(2, 50)}
        fig = vis_utils.plot_checkpoint_inference_correlation_pairs(post)
        upper_ax = fig.axes[1]
        texts = [t.get_text() for t in upper_ax.texts]
        assert texts and float(texts[0]) > 0.95  # near-perfect correlation


class TestMcmcChains:
    def test_one_line_per_chain_one_panel_per_site(self):
        samples = {
            "r0": np.random.rand(4, 100),
            "period": np.random.rand(4, 100),
        }
        fig = vis_utils.plot_mcmc_chains(samples)
        panels = [ax for ax in fig.axes if ax.get_title()]
        assert {ax.get_title() for ax in panels} == {"r0", "period"}
        for ax in panels:
            assert len(ax.lines) == 4

    def test_plated_sites_flattened(self):
        samples = {"scales": np.random.rand(2, 40, 3)}
        fig = vis_utils.plot_mcmc_chains(samples)
        titles = {ax.get_title() for ax in fig.axes if ax.get_title()}
        assert titles == {"scales_0", "scales_1", "scales_2"}


class TestPriorDistributions:
    def test_histogram_and_median_line_per_distribution(self):
        priors = {
            "r0": dist.Normal(2.0, 0.2),
            "lst": [0.0, dist.Beta(2.0, 2.0)],
        }
        fig = vis_utils.plot_prior_distributions(priors, num_samples=200)
        panels = [ax for ax in fig.axes if ax.get_title()]
        assert {ax.get_title() for ax in panels} == {"r0", "lst_1"}
        for ax in panels:
            assert len(ax.patches) >= 10  # histogram bars
            assert len(ax.lines) == 1  # median vline

    def test_no_distributions_raises(self):
        with pytest.raises(VisualizationError):
            vis_utils.plot_prior_distributions({"x": 1.0}, num_samples=10)


class TestViolins:
    def test_prior_and_posterior_violins(self):
        fig = vis_utils.plot_violin_plots(
            priors={"r0": np.random.rand(100)},
            posteriors={"r0": np.random.rand(100) + 1},
        )
        ax = fig.axes[0]
        assert [t.get_text() for t in ax.get_xticklabels()] == [
            "prior",
            "posterior",
        ]

    def test_both_none_raises(self):
        with pytest.raises(VisualizationError):
            vis_utils.plot_violin_plots()

    def test_posterior_only(self):
        fig = vis_utils.plot_violin_plots(
            posteriors={"r0": np.random.rand(50)}
        )
        assert [
            t.get_text() for t in fig.axes[0].get_xticklabels()
        ] == ["posterior"]


def test_lazy_export_via_utils_namespace():
    import dynode_tpu.utils as u

    assert callable(u.plot_mcmc_chains)
    with pytest.raises(AttributeError):
        u.not_a_function


class TestPlotPosteriorDensity:
    def _samples(self, seed=0, loc=2.0):
        rng = np.random.default_rng(seed)
        return {
            "r0": rng.normal(loc, 0.1, size=(4, 200)),
            "betas": rng.normal(0.0, 1.0, size=(4, 200, 3)),
        }

    def test_panel_per_plate_element(self):
        fig = vis_utils.plot_posterior_density(self._samples())
        titled = [ax for ax in fig.axes if ax.get_title()]
        assert sorted(ax.get_title() for ax in titled) == [
            "betas[0]",
            "betas[1]",
            "betas[2]",
            "r0",
        ]

    def test_density_trimmed_to_hdi_and_marker(self):
        fig = vis_utils.plot_posterior_density(
            self._samples(), var_names=["r0"], hdi_prob=0.5
        )
        ax = fig.axes[0]
        # one density line + one point-estimate marker
        assert len(ax.lines) == 2
        xs = ax.lines[0].get_xdata()
        draws = self._samples()["r0"].ravel()
        # the 50% HDI of a N(2, 0.1) sample is well inside the full range
        assert xs.min() > draws.min() and xs.max() < draws.max()
        marker_x = ax.lines[1].get_xdata()[0]
        assert abs(marker_x - draws.mean()) < 1e-9

    def test_overlay_two_fits_with_labels(self):
        fig = vis_utils.plot_posterior_density(
            [self._samples(0, 2.0), self._samples(1, 3.0)],
            var_names=["r0"],
            data_labels=["mcmc", "svi"],
        )
        ax = fig.axes[0]
        labels = [ln.get_label() for ln in ax.lines]
        assert "mcmc" in labels and "svi" in labels

    def test_accepts_inference_data(self):
        from dynode_tpu.infer import InferenceData

        idata = InferenceData(posterior=self._samples())
        fig = vis_utils.plot_posterior_density(idata, var_names=["r0"])
        assert fig.axes[0].get_title() == "r0"

    def test_empty_raises(self):
        with pytest.raises(VisualizationError):
            vis_utils.plot_posterior_density({})

    def test_label_count_mismatch_raises(self):
        with pytest.raises(VisualizationError):
            vis_utils.plot_posterior_density(
                self._samples(), data_labels=["a", "b"]
            )

    def test_flat_input_via_grouped_flag(self):
        rng = np.random.default_rng(0)
        flat = {"betas": rng.normal(0.0, 1.0, size=(800, 3))}
        fig = vis_utils.plot_posterior_density(
            flat, grouped_by_chain=False
        )
        titled = sorted(ax.get_title() for ax in fig.axes if ax.get_title())
        assert titled == ["betas[0]", "betas[1]", "betas[2]"]
