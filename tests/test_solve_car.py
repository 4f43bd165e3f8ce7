"""Car obstacle-avoidance acceptance test (reference: test/car.jl:1-84).

Control-box and obstacle inequality constraints plus terminal goal equality
must all be satisfied to tolerance.
"""

import numpy as np

import iterativelqr_tpu as ilqr
from iterativelqr_tpu.models import car


def test_car_constraints_satisfied():
    T = 51
    dynamics, objective, constraints, x1, xT = car.problem(T)
    us = car.initial_controls(T)
    xs = ilqr.rollout(dynamics, x1, us)

    solver = ilqr.Solver(dynamics, objective, constraints)
    solver.initialize_controls(us)
    solver.initialize_states(xs)
    sol = solver.solve()

    tol = solver.options.constraint_tolerance
    assert float(sol.max_violation) <= tol

    x_sol, u_sol = solver.get_trajectory()
    p_obs, r_obs = np.array([0.5, 0.5]), 0.1
    # stage constraints (reference assertion: test/car.jl:74)
    for t in range(T - 1):
        u = u_sol[t]
        assert np.all(-5.0 - u <= tol)
        assert np.all(u - 5.0 <= tol)
        e = x_sol[t][:2] - p_obs
        assert r_obs**2 - e @ e <= tol
    # terminal constraints (reference: test/car.jl:76-79)
    assert np.max(np.abs(x_sol[-1] - np.asarray(xT))) <= tol
    e = x_sol[-1][:2] - p_obs
    assert r_obs**2 - e @ e <= tol
