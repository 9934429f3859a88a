"""Multi-strain age-stratified SEIRS with a cumulative-incidence compartment.

Workload parity with the reference's
examples/seirs_multi_strain_age_stratified.py (2 ages x 3 strains, C
book-keeping compartment, static ``idx`` namespace baked into the compiled
program), powered by the library's batched-einsum RHS.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path shim)

import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from dynode_tpu import simulate
from dynode_tpu.models.multistrain import (
    multistrain_config,
    multistrain_initial_state,
    multistrain_ode,
    multistrain_odeparams,
)

if __name__ == "__main__":
    # identical strains except strain C's higher R0 -- C eventually dominates
    config = multistrain_config(
        r0s=(2.4, 2.5, 2.8),
        infectious_periods=(7.0, 7.0, 7.0),
        latent_periods=(3.0, 3.0, 3.0),
        waning_periods=(60.0, 60.0, 60.0),
        contact_matrix=jnp.array([[0.7, 0.3], [0.3, 0.7]]),
    )
    sol = simulate(
        ode=multistrain_ode,
        duration_days=500,
        initial_state=multistrain_initial_state(config),
        ode_parameters=multistrain_odeparams(config),
        solver_parameters=config.parameters.solver_params,
    )
    s, e, i, r, c = sol.ys
    strain_labels = ["A", "B", "C"]
    plt.figure(figsize=(12, 5))
    plt.subplot(1, 2, 1)
    for k, label in enumerate(strain_labels):
        plt.plot(sol.ts, c[:, :, k].sum(axis=1), label=f"Cumulative ({label})")
    plt.xlabel("Days")
    plt.ylabel("Cumulative Incidence")
    plt.legend()
    plt.subplot(1, 2, 2)
    for k, label in enumerate(strain_labels):
        inc = jnp.diff(c[:, :, k].sum(axis=1))
        plt.plot(sol.ts[1:], inc, label=f"Incidence ({label})")
    plt.xlabel("Days")
    plt.legend()
    plt.tight_layout()
    plt.savefig("seirs_multistrain.png", dpi=100)
    print("final cumulative incidence by strain:", c[-1].sum(axis=0))
