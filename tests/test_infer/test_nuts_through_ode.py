"""End-to-end NUTS through the adaptive ODE solve (the flagship path).

CI-sized port of examples/sir_infer_parameters.py (reference workload:
/root/reference/examples/sir_infer_parameters.py:92-116): synthesize Poisson
incidence from a fixed age-stratified SIR, fit r0 and infectious_period with
NUTS whose gradients flow through the adaptive solver, and assert posterior
recovery of the generating values — the BASELINE.md posterior-parity
criterion as an executable witness.
"""

import jax
import jax.numpy as jnp
import pytest

import dynode_tpu.dist as dist
from dynode_tpu import MCMCProcess, Strain, SVIProcess, simulate
from dynode_tpu.infer import handlers, sample_then_resolve
from dynode_tpu.models.sir import SIRParams, sir_age_config, sir_ode

TRUE_R0 = 2.0
TRUE_INF_PERIOD = 7.0
TF = 50


def _run_simulation(config, tf):
    tp = sample_then_resolve(config.parameters.transmission_params)
    strain = tp.strains[0]
    params = SIRParams(
        beta=jnp.asarray(strain.r0 / strain.infectious_period),
        gamma=jnp.asarray(1.0 / strain.infectious_period),
        contact_matrix=tp.contact_matrix,
    )
    return simulate(
        ode=sir_ode,
        duration_days=tf,
        initial_state=config.initializer.get_initial_state(),
        ode_parameters=params,
        solver_parameters=config.parameters.solver_params,
    )


def _model(config, tf, obs_data):
    solution = _run_simulation(config, tf)
    incidence = jnp.diff(solution.ys[config.idx.r], axis=0)
    incidence = jnp.maximum(incidence, 1e-6)
    handlers.sample("inf_incidence", dist.Poisson(incidence), obs=obs_data)
    return solution


POPULATION = 100_000  # large counts -> tight Poisson likelihood, so the
# posterior concentrates on the generating values and the 1% parity
# criterion (BASELINE.md) is directly assertable.


def make_observed_incidence():
    """The seeded synthetic observation (shared with the golden generator)."""
    config = sir_age_config(r_0=TRUE_R0, infectious_period=TRUE_INF_PERIOD)
    config.initializer.population_size = POPULATION
    sol = _run_simulation(config, TF)
    expected = jnp.diff(sol.ys[config.idx.r], axis=0)
    return jax.random.poisson(jax.random.PRNGKey(0), expected).astype(
        jnp.result_type(float)
    )


def make_prior_config():
    config = sir_age_config()
    config.initializer.population_size = POPULATION
    config.parameters.transmission_params.strains = [
        Strain(
            strain_name="swo9",
            r0=dist.TransformedDistribution(
                dist.Beta(0.5, 0.5), dist.AffineTransform(1.5, 1)
            ),
            infectious_period=dist.TruncatedNormal(
                loc=8, scale=2, low=2, high=15
            ),
        )
    ]
    return config


def make_mcmc_fit(prior_config, observed_incidence):
    """The seeded reference fit; tests/golden/gen_posteriors.py runs this
    exact program to pin the golden posterior moments."""
    proc = MCMCProcess(
        numpyro_model=_model,
        num_warmup=150,
        num_samples=100,
        num_chains=4,
        nuts_max_tree_depth=8,
        progress_bar=False,
    )
    proc.infer(config=prior_config, tf=TF, obs_data=observed_incidence)
    return proc


@pytest.fixture(scope="module")
def observed_incidence():
    return make_observed_incidence()


@pytest.fixture(scope="module")
def prior_config():
    return make_prior_config()


@pytest.fixture(scope="module")
def mcmc_fit(prior_config, observed_incidence):
    return make_mcmc_fit(prior_config, observed_incidence)


@pytest.fixture(scope="module")
def chees_fit(prior_config, observed_incidence):
    proc = MCMCProcess(
        numpyro_model=_model,
        num_warmup=200,
        num_samples=100,
        num_chains=16,
        nuts_max_tree_depth=8,  # unused by chees; field is required
        sampler="chees",
        progress_bar=False,
    )
    proc.infer(config=prior_config, tf=TF, obs_data=observed_incidence)
    return proc


@pytest.fixture(scope="module")
def svi_fit(prior_config, observed_incidence):
    proc = SVIProcess(
        numpyro_model=_model,
        num_iterations=400,
        num_samples=200,
        progress_bar=False,
    )
    proc.infer(config=prior_config, tf=TF, obs_data=observed_incidence)
    return proc


class TestNUTSThroughODE:
    def test_posterior_recovers_generating_values(self, mcmc_fit):
        samples = mcmc_fit.get_samples()
        r0 = float(jnp.mean(samples["strains_0_r0"]))
        ip = float(jnp.mean(samples["strains_0_infectious_period"]))
        # BASELINE.md posterior-parity criterion: within 1% of the
        # generating values (the likelihood is tight at this population).
        assert r0 == pytest.approx(TRUE_R0, rel=0.01), r0
        assert ip == pytest.approx(TRUE_INF_PERIOD, rel=0.01), ip

    def test_zero_divergences(self, mcmc_fit):
        extras = mcmc_fit._inferer.get_extra_fields()
        assert int(jnp.sum(extras["diverging"])) == 0

    def test_posterior_moments_match_golden(self, mcmc_fit):
        """Pin the seeded f64 CPU posterior against tests/golden/posteriors.npz.

        The generating-value check above proves statistical correctness; this
        one locks the *exact seeded posterior moments* so sampler/solver
        refactors cannot silently shift the posterior while staying inside
        the 1% recovery band. Regenerate with tests/golden/gen_posteriors.py
        after an intentional sampler change (document why in the commit).
        """
        import pathlib

        import numpy as np

        golden_path = (
            pathlib.Path(__file__).parents[1] / "golden" / "posteriors.npz"
        )
        if not golden_path.exists():
            pytest.skip("golden posterior artifact not generated")
        golden = np.load(golden_path)
        samples = mcmc_fit.get_samples()
        for site in ("strains_0_r0", "strains_0_infectious_period"):
            arr = np.asarray(samples[site], dtype=np.float64)
            np.testing.assert_allclose(
                arr.mean(), golden[f"{site}_mean"], rtol=5e-3,
                err_msg=f"{site} posterior mean drifted from golden",
            )
            np.testing.assert_allclose(
                arr.std(), golden[f"{site}_std"], rtol=0.10,
                err_msg=f"{site} posterior std drifted from golden",
            )

    def test_chains_mixed(self, mcmc_fit):
        # per-chain posterior means must agree across all 4 chains
        by_chain = mcmc_fit.get_samples(group_by_chain=True)
        r0_chain_means = jnp.mean(by_chain["strains_0_r0"], axis=1)
        assert float(jnp.max(r0_chain_means) - jnp.min(r0_chain_means)) < 0.02

    def test_sample_shapes_and_finiteness(self, mcmc_fit):
        samples = mcmc_fit.get_samples()
        assert samples["strains_0_r0"].shape == (400,)
        for v in samples.values():
            assert bool(jnp.all(jnp.isfinite(v)))


class TestChEESThroughODE:
    """Same flagship gradient path under the wide-bank ChEES kernel
    (infer/chees.py): trajectory-length adaptation must recover the same
    posterior as NUTS through the adaptive ODE solve."""

    def test_chees_recovers_generating_values(self, chees_fit):
        samples = chees_fit.get_samples()
        r0 = float(jnp.mean(samples["strains_0_r0"]))
        ip = float(jnp.mean(samples["strains_0_infectious_period"]))
        assert r0 == pytest.approx(TRUE_R0, rel=0.01), r0
        assert ip == pytest.approx(TRUE_INF_PERIOD, rel=0.01), ip
        extras = chees_fit._inferer.get_extra_fields()
        assert float(jnp.mean(extras["accept_prob"])) > 0.4


class TestSVIThroughODE:
    def test_svi_recovers_generating_values(self, svi_fit):
        samples = svi_fit.get_samples()
        r0 = float(jnp.mean(samples["strains_0_r0"]))
        ip = float(jnp.mean(samples["strains_0_infectious_period"]))
        assert r0 == pytest.approx(TRUE_R0, rel=0.02), r0
        assert ip == pytest.approx(TRUE_INF_PERIOD, rel=0.03), ip


class TestQuadratureOracle:
    """Parity against the EXACT posterior (tests/golden/quadrature.npz).

    The quadrature golden is computed by f64 grid quadrature with
    scipy-DOP853 solves and scipy.stats prior densities
    (tests/golden/gen_quadrature.py) -- a witness sharing no code with
    this repo's solver, distributions, or samplers. It closes the
    BASELINE.md 1% posterior-parity criterion non-circularly: a
    systematic bias shared by our solver+sampler would pass the
    self-generated posteriors.npz golden but fail here.
    """

    @pytest.fixture(scope="class")
    def quad(self):
        import pathlib

        import numpy as np

        path = pathlib.Path(__file__).parents[1] / "golden" / "quadrature.npz"
        if not path.exists():
            pytest.skip("quadrature golden not generated")
        return np.load(path)

    @staticmethod
    def _assert_parity(samples, quad, *, mean_rtol=0.01, std_rtol=0.25):
        import numpy as np

        for site in ("strains_0_r0", "strains_0_infectious_period"):
            arr = np.asarray(samples[site], dtype=np.float64)
            q_mean = float(quad[f"{site}_mean"])
            q_std = float(quad[f"{site}_std"])
            assert arr.mean() == pytest.approx(q_mean, rel=mean_rtol), (
                f"{site} mean {arr.mean():.6f} vs exact {q_mean:.6f}"
            )
            assert arr.std() == pytest.approx(q_std, rel=std_rtol), (
                f"{site} std {arr.std():.6f} vs exact {q_std:.6f}"
            )
            # the sampler mean must sit well inside the exact 94% interval
            lo, hi = np.asarray(quad[f"{site}_eti94"])
            assert lo < arr.mean() < hi, (site, arr.mean(), (lo, hi))

    def test_nuts_matches_exact_posterior(self, mcmc_fit, quad):
        self._assert_parity(mcmc_fit.get_samples(), quad)

    def test_chees_matches_exact_posterior(self, chees_fit, quad):
        self._assert_parity(chees_fit.get_samples(), quad)

    def test_svi_matches_exact_posterior(self, svi_fit, quad):
        # the 1% criterion is on MEANS (BASELINE.md); the full-rank
        # Gaussian guide under 1-particle ELBO at this iteration budget
        # overestimates the rho=0.96 posterior's marginal stds by ~40%
        # (measured 0.079 vs exact 0.055 on infectious_period), so the
        # std band documents that known bias rather than hiding it
        self._assert_parity(svi_fit.get_samples(), quad, std_rtol=0.55)
