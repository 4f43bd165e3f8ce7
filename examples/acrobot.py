"""Acrobot swing-up (reference: examples/acrobot.jl).

Swing the underactuated double pendulum from hanging (0,0,0,0) to upright
(pi,0,0,0) with a terminal equality constraint.  Run: python examples/acrobot.py
"""

import jax.numpy as jnp
import numpy as np

from iterativelqr_tpu import Options, Solver, rollout
from iterativelqr_tpu.models import acrobot


def main():
    T = 51
    dynamics, objective, constraints, x1, xT = acrobot.problem(T)
    solver = Solver(
        dynamics, objective, constraints, options=Options(verbose=True)
    )

    us = [0.05 * jnp.ones(1) for _ in range(T - 1)]
    solver.initialize_states(rollout(dynamics, x1, us))
    solver.initialize_controls(us)

    sol = solver.solve()
    xs, _ = solver.get_trajectory()
    print("terminal state:", np.asarray(xs[-1]), " goal:", np.asarray(xT))
    print("terminal error:", float(np.abs(np.asarray(xs[-1]) - np.asarray(xT)).max()))


if __name__ == "__main__":
    main()
