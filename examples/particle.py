"""Particle double-integrator quickstart (reference: examples/particle.jl).

Move a 2-state particle to x_goal = (1, 0) in T=11 steps under a terminal
equality constraint.  Run: python examples/particle.py
"""

import jax.numpy as jnp

from iterativelqr_tpu import Options, Solver, rollout
from iterativelqr_tpu.models import particle


def main():
    T = 11
    dynamics, objective, constraints, x1, xT = particle.problem(T)
    solver = Solver(
        dynamics, objective, constraints, options=Options(verbose=True)
    )

    # initialize with zero actions rolled out open loop
    # (reference: examples/particle.jl:40-47)
    us = [jnp.zeros(1) for _ in range(T - 1)]
    solver.initialize_states(rollout(dynamics, x1, us))
    solver.initialize_controls(us)

    sol = solver.solve()
    xs, us = solver.get_trajectory()
    print("terminal state:", xs[-1], " goal:", xT)
    print("max violation:", float(sol.max_violation))


if __name__ == "__main__":
    main()
