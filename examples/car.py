"""Unicycle car with obstacle avoidance (reference: examples/car.jl).

Drive to (1, 1, 0) around a circular obstacle at (0.5, 0.5) under control box
bounds — inequality + terminal equality constraints.
Run: python examples/car.py
"""

import jax.numpy as jnp
import numpy as np

from iterativelqr_tpu import Options, Solver, rollout
from iterativelqr_tpu.models import car


def main():
    T = 51
    dynamics, objective, constraints, x1, xT = car.problem(T)
    solver = Solver(
        dynamics, objective, constraints, options=Options(verbose=True)
    )

    us = car.initial_controls(T)
    solver.initialize_states(rollout(dynamics, x1, us))
    solver.initialize_controls(us)

    sol = solver.solve()
    xs, us = solver.get_trajectory()
    xs = np.stack(xs)
    dist = np.hypot(xs[:, 0] - 0.5, xs[:, 1] - 0.5)
    print("terminal state:", xs[-1], " goal:", np.asarray(xT))
    print("closest obstacle approach:", dist.min(), "(radius 0.1)")
    print("max violation:", float(sol.max_violation))


if __name__ == "__main__":
    main()
