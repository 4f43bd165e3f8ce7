"""Acrobot swing-up acceptance test (reference: test/acrobot.jl:1-119).

Terminal equality constraint x_T = (pi, 0, 0, 0) must be met to the solver's
constraint tolerance from a seeded random control initialization.
"""

import numpy as np

import iterativelqr_tpu as ilqr
from iterativelqr_tpu.models import acrobot


def test_acrobot_swingup_terminal_constraint():
    T = 51
    dynamics, objective, constraints, x1, xT = acrobot.problem(T)
    rng = np.random.default_rng(1)
    us = [1.0 * rng.standard_normal(1) for _ in range(T - 1)]
    xs = ilqr.rollout(dynamics, x1, us)

    solver = ilqr.Solver(dynamics, objective, constraints)
    solver.initialize_controls(us)
    solver.initialize_states(xs)
    sol = solver.solve()

    x_sol, u_sol = solver.get_trajectory()
    err = np.max(np.abs(x_sol[-1] - np.asarray(xT)))
    # reference assertion: test/acrobot.jl:114 with constraint_tolerance=5e-3
    assert err < 5.0e-3
    assert float(sol.max_violation) < 5.0e-3
    assert len(u_sol) == T - 1
