"""Extra model families + remaining option-surface coverage.

- pendulum swing-up (model from reference test/dynamics.jl:5-16)
- cartpole swing-up with control-limit inequalities (new family)
- line_search="none" mode (reference src/options.jl:2)
- AL iteration callback hook for continuation schemes (reference
  src/solve.jl:124-125)
"""

import jax
import jax.numpy as jnp
import numpy as np

from iterativelqr_tpu import CallbackState, Options, Solver, rollout
from iterativelqr_tpu.models import cartpole, pendulum


def _warm(solver, dynamics, x1, us):
    solver.initialize_states(rollout(dynamics, x1, us))
    solver.initialize_controls(us)
    return solver


def test_pendulum_swing_up():
    T = 51
    dynamics, objective, constraints, x1, xT = pendulum.problem(T)
    solver = Solver(dynamics, objective, constraints, options=Options(verbose=False))
    us = [0.1 * jnp.ones(1)] * (T - 1)
    _warm(solver, dynamics, x1, us)
    sol = solver.solve()
    assert float(sol.max_violation) <= 5.0e-3
    xs, _ = solver.get_trajectory()
    np.testing.assert_allclose(np.asarray(xs[-1]), np.asarray(xT), atol=5e-3)


def test_cartpole_swing_up_with_control_limits():
    T = 101
    u_limit = 10.0
    dynamics, objective, constraints, x1, xT = cartpole.problem(T, u_limit)
    solver = Solver(
        dynamics, objective, constraints,
        options=Options(verbose=False, max_dual_updates=12),
    )
    us = [0.1 * jnp.ones(1)] * (T - 1)
    _warm(solver, dynamics, x1, us)
    sol = solver.solve()
    assert float(sol.max_violation) <= 5.0e-3
    xs, us_sol = solver.get_trajectory()
    xf = np.asarray(xs[-1])
    # upright (any winding of theta), cart at origin, at rest
    assert abs(xf[0]) <= 5e-3
    assert np.cos(xf[1]) <= -1.0 + 1e-4
    assert np.abs(xf[2:]).max() <= 5e-3
    # control limits honored to tolerance
    u_arr = np.stack(us_sol)
    assert np.abs(u_arr).max() <= u_limit + 5e-3


def test_line_search_none_mode():
    """Full steps every iteration still solve the (easy) pendulum problem."""
    T = 31
    dynamics, objective, constraints, x1, xT = pendulum.problem(T)
    solver = Solver(
        dynamics, objective, constraints,
        options=Options(verbose=False, line_search="none"),
    )
    us = [0.1 * jnp.ones(1)] * (T - 1)
    _warm(solver, dynamics, x1, us)
    sol = solver.solve()
    assert float(sol.max_violation) <= 5.0e-3
    assert float(sol.step_size) == 1.0  # only full steps exist in this mode


def test_al_callback_continuation():
    """The hook runs between dual updates and can modify parameters — here it
    tightens a homotopy weight stored in ws (continuation scheme pattern)."""
    from iterativelqr_tpu import Constraint, Cost, Dynamics, make_solve_fn
    from iterativelqr_tpu.core.spec import build_spec

    T = 9
    A = jnp.array([[1.0, 0.2], [0.0, 1.0]])
    B = jnp.array([0.0, 0.2])
    dyn = Dynamics(lambda x, u, w: A @ x + B * u[0], 2, 1, num_parameter=1)
    # stage cost weight ramps via the parameter
    stage = Cost(
        lambda x, u, w: w[0] * jnp.sum(x**2) + 0.1 * jnp.sum(u**2),
        2, 1, num_parameter=1,
    )
    term = Cost(lambda x, u, w: w[0] * jnp.sum(x**2), 2, 0, num_parameter=1)
    goal = Constraint(lambda x, u, w: x - jnp.array([1.0, 0.0]), 2, 0, num_parameter=1)
    spec = build_spec(
        [dyn] * (T - 1), [stage] * (T - 1) + [term],
        [Constraint() for _ in range(T - 1)] + [goal],
    )

    def continuation(state: CallbackState) -> CallbackState:
        # double the tracking weight each AL round
        return CallbackState(
            xs=state.xs, us=state.us, ws=state.ws * 2.0,
            duals=state.duals, penalty=state.penalty,
            al_iteration=state.al_iteration,
        )

    opts = Options(verbose=False, constraint_tolerance=1e-6, max_dual_updates=8)
    solve = jax.jit(make_solve_fn(spec, opts, callback=continuation))
    ws = 0.1 * jnp.ones((T, 1), jnp.float64)
    xs0 = jnp.zeros((T, 2), jnp.float64)
    us0 = jnp.zeros((T - 1, 1), jnp.float64)
    sol = solve(xs0, us0, ws)
    assert float(sol.max_violation) <= 1e-4
    assert int(sol.al_iterations) >= 2  # the hook actually ran


def test_quadrotor_waypoint_with_thrust_limits():
    """12-state / 4-control model: larger-dimension Riccati blocks in a real
    constrained solve (thrust-bound inequalities + terminal hover equality)."""
    from iterativelqr_tpu.models import quadrotor

    T = 41
    dynamics, objective, constraints, x1, xT = quadrotor.problem(T)
    solver = Solver(
        dynamics, objective, constraints, options=Options(verbose=False)
    )
    us = quadrotor.hover_controls(T)
    _warm(solver, dynamics, x1, us)
    sol = solver.solve()
    assert float(sol.max_violation) <= 5.0e-3
    xs, us_sol = solver.get_trajectory()
    np.testing.assert_allclose(
        np.asarray(xs[-1][:3]), np.asarray(xT[:3]), atol=5e-3
    )
    u_arr = np.stack(us_sol)
    assert u_arr.min() >= -5e-3 and u_arr.max() <= 6.0 + 5e-3
