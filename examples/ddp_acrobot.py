"""Gauss-Newton iLQR vs full DDP on the acrobot swing-up.

The reference's backward pass is Gauss-Newton iLQR (reference:
src/backward_pass.jl:42-90); ``Options(ddp=True)`` adds the second-order
dynamics terms sum_i Vx_i * d2f_i with Tassa-style state regularization
(ops/backward.py).  On this problem the curvature steers the solver to a
measurably better local optimum at a similar iteration count — on others
(car) it costs iterations; see core/options.py for the measured trade-offs.

Run: python examples/ddp_acrobot.py
"""

import jax.numpy as jnp

from iterativelqr_tpu import Options, Solver, rollout
from iterativelqr_tpu.models import acrobot


def solve_with(ddp: bool, T: int = 101):
    dynamics, objective, constraints, x1, xT = acrobot.problem(T)
    solver = Solver(
        dynamics, objective, constraints,
        options=Options(verbose=False, ddp=ddp),
    )
    us = [0.05 * jnp.ones(1) for _ in range(T - 1)]
    solver.initialize_states(rollout(dynamics, x1, us))
    solver.initialize_controls(us)
    sol = solver.solve()
    return sol


def main():
    for ddp in (False, True):
        sol = solve_with(ddp)
        name = "full DDP     " if ddp else "Gauss-Newton "
        print(
            f"{name} objective {float(sol.objective):10.4f}  "
            f"violation {float(sol.max_violation):.2e}  "
            f"iterations {int(sol.iterations)}"
        )


if __name__ == "__main__":
    main()
