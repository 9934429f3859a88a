"""Contract tests for checkpoint_compartment_sizes.

The site-name contract is shared with the reference
(src/dynode/infer/checkpointing.py:12-47): ``final_timestep_{comp}`` and
``{Y_m_d}_timestep_{comp}`` deterministic sites, with out-of-range dates
silently skipped.
"""

import datetime

import jax.numpy as jnp
import numpy as np

from dynode_tpu.infer import checkpoint_compartment_sizes, handlers
from dynode_tpu.models.sir import sir_config
from dynode_tpu.ode import Solution


def _fake_solution(n_days=10, width=1):
    ts = jnp.arange(float(n_days))
    ys = tuple(
        jnp.arange(float(n_days))[:, None] * (i + 1) + jnp.zeros((1, width))
        for i in range(3)
    )
    return Solution(
        t0=ts[0], t1=ts[-1], ts=ts, ys=ys, stats={},
        result=jnp.asarray(0),
    )


def test_final_timestep_sites_and_values():
    cfg = sir_config()
    sol = _fake_solution()
    with handlers.trace() as tr:
        checkpoint_compartment_sizes(cfg, sol)
    for name in ("s", "i", "r"):
        site = tr[f"final_timestep_{name}"]
        assert site["type"] == "deterministic"
        idx = getattr(cfg.idx, name)
        np.testing.assert_allclose(site["value"], sol.ys[idx][-1])
    assert len(tr) == 3


def test_dated_sites_resolve_to_sim_days():
    cfg = sir_config()  # initialize_date = 2022-02-11
    init = cfg.initializer.initialize_date
    sol = _fake_solution(n_days=10)
    day3 = init + datetime.timedelta(days=3)
    with handlers.trace() as tr:
        checkpoint_compartment_sizes(
            cfg, sol, save_final_timesteps=False,
            compartment_save_dates=[day3],
        )
    assert set(tr) == {
        f"{day3.strftime('%Y_%m_%d')}_timestep_{n}" for n in ("s", "i", "r")
    }
    np.testing.assert_allclose(
        tr[f"{day3.strftime('%Y_%m_%d')}_timestep_i"]["value"],
        sol.ys[cfg.idx.i][3],
    )


def test_out_of_range_dates_silently_skipped():
    cfg = sir_config()
    init = cfg.initializer.initialize_date
    sol = _fake_solution(n_days=10)
    with handlers.trace() as tr:
        checkpoint_compartment_sizes(
            cfg, sol,
            compartment_save_dates=[
                init - datetime.timedelta(days=1),      # before t0
                init + datetime.timedelta(days=99),     # past the grid
                init + datetime.timedelta(days=2),      # in range
            ],
        )
    # 3 final + 3 dated (only the in-range date)
    assert len(tr) == 6
    assert any(k.startswith("2022_02_13_timestep_") for k in tr)


def test_no_sites_outside_handler_stack_is_a_noop():
    cfg = sir_config()
    sol = _fake_solution()
    # must not raise when no trace is active (reference behavior)
    checkpoint_compartment_sizes(cfg, sol)
