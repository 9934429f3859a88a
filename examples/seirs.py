"""SEIRS with immune waning (R -> S), using the library model family.

Workload parity with the reference's examples/seirs.py: extra parameters
(latent_period, waning_period) ride on TransmissionParams' open extras.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path shim)

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from dynode_tpu import simulate
from dynode_tpu.models.seirs import seirs_config, seirs_ode, seirs_odeparams

if __name__ == "__main__":
    config = seirs_config(r_0=2.0, infectious_period=7.0, latent_period=3.0,
                          waning_period=60.0)
    sol = simulate(
        ode=seirs_ode,
        duration_days=500,
        initial_state=config.initializer.get_initial_state(),
        ode_parameters=seirs_odeparams(config),
        solver_parameters=config.parameters.solver_params,
    )
    for name, series in zip("seir", sol.ys):
        plt.plot(sol.ts, series.squeeze(), label=name.upper())
    plt.xlabel("Days")
    plt.ylabel("Population")
    plt.legend()
    plt.title("SEIRS with waning (dynode_tpu)")
    plt.savefig("seirs_example.png", dpi=100)
    s, e, i, r = [a.squeeze() for a in sol.ys]
    print("endemic S (expect N/R0=500):", float(s[-1]))
