"""Parameter sensitivities dJ*/dw (ops/sensitivity.py).

A tracking problem whose stage costs follow a parameterized target path: one
adjoint sweep returns the gradient of the optimal cost with respect to every
per-timestep parameter at once — the feature the reference listed as "coming
soon" (reference README.md:28).

Run: python examples/sensitivity_demo.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from iterativelqr_tpu import (
    Constraint, Cost, Dynamics, Options, make_solve_fn,
    solution_parameter_gradient,
)
from iterativelqr_tpu.core.spec import build_spec


def main():
    T = 11
    A = jnp.array([[1.0, 0.2], [0.0, 1.0]])
    B = jnp.array([0.0, 0.2])
    dyn = Dynamics(lambda x, u, w: A @ x + B * u[0], 2, 1, num_parameter=2)
    stage = Cost(
        lambda x, u, w: 0.5 * jnp.sum((x - w) ** 2) + 0.05 * jnp.sum(u**2),
        2, 1, num_parameter=2,
    )
    term = Cost(lambda x, u, w: 0.5 * jnp.sum((x - w) ** 2), 2, 0, num_parameter=2)
    goal = Constraint(lambda x, u, w: x - w, 2, 0, num_parameter=2)
    spec = build_spec(
        [dyn] * (T - 1), [stage] * (T - 1) + [term],
        [Constraint() for _ in range(T - 1)] + [goal],
    )
    opts = Options(verbose=False)
    solve = jax.jit(make_solve_fn(spec, opts))

    # target path: ramp to (1, 0)
    t = jnp.linspace(0.0, 1.0, T)
    ws = jnp.stack([t, jnp.zeros(T)], axis=1)
    sol = solve(jnp.zeros((T, 2)), jnp.zeros((T - 1, 1)), ws)
    print("solved: violation", float(sol.max_violation))

    g = solution_parameter_gradient(spec, opts, sol, ws)
    print("\n dJ*/dw_t (sensitivity of optimal cost to each target point):")
    for k in range(T):
        print(f"  t={k:>2}  dJ/dw = [{float(g[k,0]):>9.4f}, {float(g[k,1]):>9.4f}]")
    print(
        "\nlargest influence:",
        int(np.argmax(np.abs(np.asarray(g)).sum(axis=1))),
        "(the terminal-constraint target dominates)",
    )


if __name__ == "__main__":
    main()
