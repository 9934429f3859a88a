"""SEIP: the production respiratory model (age x history x vax x wane x strain).

The model the reference documents in ode_model.md but keeps in a private
repo -- here it is a library model family: layered immunity, bitwise-OR
immune-history transitions, spline-driven vaccination with a seasonal reset,
external strain introduction, and seasonal transmission forcing.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path shim)

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from dynode_tpu import simulate
from dynode_tpu.config import SolverParams
from dynode_tpu.models.seip import (
    seip_config,
    seip_initial_state,
    seip_ode,
    seip_odeparams,
)

if __name__ == "__main__":
    config = seip_config(
        seasonal_vaccination=True,
        solver_params=SolverParams(step_budget=1024),
    )
    sol = simulate(
        ode=seip_ode,
        duration_days=365,
        initial_state=seip_initial_state(config),
        ode_parameters=seip_odeparams(config),
        solver_parameters=config.parameters.solver_params,
    )
    S, E, I, C = [np.asarray(a) for a in sol.ys]
    t = np.asarray(sol.ts)

    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    strain_names = [s.strain_name for s in config.parameters.transmission_params.strains]
    for k, name in enumerate(strain_names):
        axes[0][0].plot(t, I[:, :, :, :, k].sum(axis=(1, 2, 3)), label=name)
    axes[0][0].set_title("Infectious by strain")
    axes[0][0].legend()

    for k in range(S.shape[3]):
        axes[0][1].plot(t, S[:, :, :, k, :].sum(axis=(1, 2, 3)), label=f"dose {k}")
    axes[0][1].set_title("Susceptibles by vaccine dose")
    axes[0][1].legend()

    for m in range(S.shape[4]):
        axes[1][0].plot(t, S[:, :, :, :, m].sum(axis=(1, 2, 3)), label=f"W{m}")
    axes[1][0].set_title("Susceptibles by waning stage")
    axes[1][0].legend()

    hist_names = [b.name for b in config.get_compartment("s").dimensions[1].bins]
    for j, hname in enumerate(hist_names):
        axes[1][1].plot(t, S[:, :, j].sum(axis=(1, 2, 3)), label=hname)
    axes[1][1].set_title("Susceptibles by immune history")
    axes[1][1].legend()
    fig.tight_layout()
    fig.savefig("seip_overview.png", dpi=100)
    print("final cumulative infections by strain:", C[-1].sum(axis=(0, 1, 2)))
    print("saved seip_overview.png")
