"""End-to-end solve on the particle problem (reference: examples/particle.jl).

The double integrator with quadratic costs is an exact LQR problem, so the
unconstrained solve must match the analytic Riccati solution, and the
constrained solve must hit the terminal goal to tolerance.
"""

import jax.numpy as jnp
import numpy as np

import iterativelqr_tpu as ilqr
from iterativelqr_tpu.models import particle


def _rollout_init(dynamics, x1, us):
    xs = ilqr.rollout(dynamics, x1, us)
    return xs


def test_particle_constrained_reaches_goal():
    T = 11
    dynamics, objective, constraints, x1, xT = particle.problem(T)
    rng = np.random.default_rng(0)
    us = [0.1 * rng.standard_normal(1) for _ in range(T - 1)]
    xs = _rollout_init(dynamics, x1, us)

    solver = ilqr.Solver(dynamics, objective, constraints)
    solver.initialize_controls(us)
    solver.initialize_states(xs)
    sol = solver.solve()

    assert bool(sol.status)
    assert float(sol.max_violation) <= 5.0e-3
    x_sol, _ = solver.get_trajectory()
    np.testing.assert_allclose(x_sol[-1], np.asarray(xT), atol=5.0e-3)


def test_particle_unconstrained_matches_analytic_lqr():
    T = 11
    dynamics, objective, _, x1, _ = particle.problem(T)
    us = [np.zeros(1) for _ in range(T - 1)]
    xs = _rollout_init(dynamics, np.array([1.0, 0.5]), us)

    solver = ilqr.Solver(dynamics, objective)  # unconstrained
    solver.initialize_controls(us)
    solver.initialize_states(xs)
    sol = solver.solve()

    # analytic discrete-time LQR via backward Riccati recursion
    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.0], [1.0]])
    Q = 0.2 * np.eye(2)  # cost 0.1 x'x -> Hessian 0.2 I
    R = 0.2 * np.eye(1)
    P = 0.2 * np.eye(2)
    Ks = []
    for _ in range(T - 1):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ A - A.T @ P @ B @ K
        Ks.append(K)
    Ks = Ks[::-1]
    x = np.array([1.0, 0.5])
    xs_ref, us_ref = [x], []
    for t in range(T - 1):
        u = -Ks[t] @ x
        us_ref.append(u)
        x = A @ x + B[:, 0] * u[0]
        xs_ref.append(x)

    x_sol, u_sol = solver.get_trajectory()
    np.testing.assert_allclose(np.stack(x_sol), np.stack(xs_ref), atol=1e-5)
    np.testing.assert_allclose(np.stack(u_sol), np.stack(us_ref), atol=1e-5)
    assert float(sol.gradient_norm) < 1e-3
