"""Generate the posterior-moment golden artifact (tests/golden/posteriors.npz).

Runs the EXACT seeded f64 CPU NUTS fit that
tests/test_infer/test_nuts_through_ode.py executes (the CI-sized port of the
reference workload /root/reference/examples/sir_infer_parameters.py:92-116)
and pins its posterior means/stds. Re-run only after an *intentional* sampler
or solver change, and say why in the commit message:

    python tests/golden/gen_posteriors.py
"""

import pathlib
import sys

ROOT = pathlib.Path(__file__).parents[2]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from test_infer.test_nuts_through_ode import (  # noqa: E402
    make_mcmc_fit,
    make_observed_incidence,
    make_prior_config,
)


def main():
    proc = make_mcmc_fit(make_prior_config(), make_observed_incidence())
    samples = proc.get_samples()
    out = {}
    for site in ("strains_0_r0", "strains_0_infectious_period"):
        arr = np.asarray(samples[site], dtype=np.float64)
        out[f"{site}_mean"] = arr.mean()
        out[f"{site}_std"] = arr.std()
        print(f"{site}: mean={arr.mean():.6f} std={arr.std():.6f}")
    path = pathlib.Path(__file__).parent / "posteriors.npz"
    np.savez(path, **out)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
