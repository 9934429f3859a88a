"""Compensated-f32 accuracy table: global error vs f64 golden, plain vs Kahan.

Constant-step Tsit5 on the age-structured SIR workload at several dt; the f64
solve on the same grid is the golden (identical truncation), so the reported
error isolates accumulation roundoff. Run on CPU (same IEEE f32 arithmetic
as TPU for these elementwise chains); TPU throughput cost is measured by
probe_compensated_tpu.py.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path shim)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dynode_tpu.ode import SaveAt, Tsit5, diffeqsolve  # noqa: E402

POP = 1e4


def rhs(dtype):
    beta = jnp.asarray(0.4 / POP, dtype)
    gamma = jnp.asarray(0.1, dtype)

    def f(t, y, args):
        s, i, r = y
        inf = beta * s * i
        return (-inf, inf - gamma * i, gamma * i)

    return f


def solve(dtype, compensated, dt, duration=160.0):
    y0 = tuple(jnp.asarray(v, dtype) for v in (POP - 10.0, 10.0, 0.0))
    sol = diffeqsolve(
        rhs(dtype), Tsit5(), 0.0, duration, dt, y0,
        saveat=SaveAt(ts=jnp.linspace(0.0, duration, int(duration) + 1)),
        compensated_summation=compensated,
    )
    return np.asarray(jnp.stack(sol.ys), dtype=np.float64)


if __name__ == "__main__":
    print(f"{'dt':>8} {'steps':>8} {'plain f32':>12} {'kahan f32':>12} {'gain':>7}")
    for dt in (0.1, 0.02, 0.004, 0.001):
        ref = solve(jnp.float64, False, dt)
        plain = np.max(np.abs(solve(jnp.float32, False, dt) - ref))
        comp = np.max(np.abs(solve(jnp.float32, True, dt) - ref))
        n = int(160.0 / dt)
        print(
            f"{dt:8.3f} {n:8d} {plain:12.3e} {comp:12.3e} "
            f"{plain / max(comp, 1e-300):6.1f}x   (abs err on ~1e4 pop)"
        )
