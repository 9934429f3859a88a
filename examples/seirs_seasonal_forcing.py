"""SEIRS with sinusoidal seasonal transmission forcing.

Workload parity with the reference's examples/seirs_seasonal_forcing.py:
beta(t) = beta * (1 + amplitude * sin(2 pi t / period + phase)) via a nested
pytree-dataclass inside the ODE params.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path shim)

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from dynode_tpu import simulate
from dynode_tpu.models.seirs import (
    seirs_odeparams,
    seirs_seasonal_config,
    seirs_seasonal_ode,
)

if __name__ == "__main__":
    config = seirs_seasonal_config(
        r_0=2.0,
        infectious_period=7.0,
        latent_period=3.0,
        waning_period=60.0,
        seasonal_amplitude=0.2,
        seasonal_period=365.0,
    )
    sol = simulate(
        ode=seirs_seasonal_ode,
        duration_days=3 * 365,
        initial_state=config.initializer.get_initial_state(),
        ode_parameters=seirs_odeparams(config, seasonal=True),
        solver_parameters=config.parameters.solver_params,
    )
    s, e, i, r = [a.squeeze() for a in sol.ys]
    plt.plot(sol.ts, i, label="Infectious")
    plt.xlabel("Days")
    plt.ylabel("Population")
    plt.legend()
    plt.title("Seasonally-forced SEIRS (dynode_tpu)")
    plt.savefig("seirs_seasonal.png", dpi=100)
    print("oscillation amplitude in final year (std):", float(i[-365:].std()))
