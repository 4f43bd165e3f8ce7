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


def test_adaptive_penalty_schedule_cuts_iterations():
    """The stall-gated AL schedule (Options.adaptive_penalty, the default)
    must converge acrobot in substantially fewer total inner iterations than
    the reference's fixed one-decade-per-round schedule, at unchanged
    tolerances (measured: T=51 115 -> 65, T=101 99 -> 37)."""
    import jax
    import jax.numpy as jnp

    from iterativelqr_tpu.core.solve import make_solve_fn
    from iterativelqr_tpu.core.spec import build_spec
    from iterativelqr_tpu.ops.rollout import open_loop_rollout

    T = 51
    dynamics, objective, constraints, x1, xT = acrobot.problem(T)
    spec = build_spec(dynamics, objective, constraints)
    us = jnp.full((T - 1, spec.nu), 0.05, jnp.float64)
    ws = jnp.zeros((T, spec.npar), jnp.float64)
    xs = open_loop_rollout(
        spec, jnp.zeros(spec.nx, jnp.float64).at[:4].set(x1), us, ws
    )
    ref = jax.jit(
        make_solve_fn(spec, ilqr.Options(adaptive_penalty=False))
    )(xs, us, ws)
    ada = jax.jit(
        make_solve_fn(spec, ilqr.Options(adaptive_penalty=True))
    )(xs, us, ws)
    assert float(ref.max_violation) <= 5e-3
    assert float(ada.max_violation) <= 5e-3
    assert int(ada.iterations) < int(ref.iterations) * 0.8, (
        int(ada.iterations), int(ref.iterations)
    )
