"""Time-varying dimensions: padded solves must equal equivalent exact solves.

SURVEY.md "hard parts" #3: padding through the Riccati recursion is easy to
get subtly wrong (padded action dims must yield zero gain rows and identity
Quu blocks).  Properties tested:

1. A heterogeneous problem (some timesteps with NO action — num_action=0,
   exercising the u-mask path) matches an equivalent homogeneous problem in
   which those actions exist but are dynamically inert and penalized (their
   optimum is exactly zero).
2. State dimension changes along the horizon (R2 -> R3 -> R2) build, solve,
   and satisfy the terminal constraint (reference capability: README.md:26,
   num_next_state != num_state, src/dynamics.jl:5-8).
3. Mixed stage types use lax.switch / static grouping consistently between
   rollout and derivative stacks.
"""

import jax
import jax.numpy as jnp
import numpy as np

from iterativelqr_tpu import Constraint, Cost, Dynamics, Options
from iterativelqr_tpu.core.solve import make_solve_fn
from iterativelqr_tpu.core.spec import build_spec

A = jnp.array([[1.0, 0.3], [0.0, 1.0]])
B = jnp.array([0.0, 0.3])
GOAL = jnp.array([1.0, 0.0])


def _solve(spec, xs0=None, opts=None):
    opts = opts or Options(verbose=False)
    solve = jax.jit(make_solve_fn(spec, opts))
    T = spec.T
    xs = jnp.zeros((T, spec.nx), jnp.float64)
    if xs0 is not None:
        xs = xs.at[0, : xs0.shape[0]].set(xs0)
    us = jnp.zeros((T - 1, spec.nu), jnp.float64)
    ws = jnp.zeros((T, max(spec.npar, 0)), jnp.float64)
    return solve(xs, us, ws)


def test_actionless_steps_match_inert_action_formulation():
    T = 9
    act = Dynamics(lambda x, u: A @ x + B * u[0], 2, 1)
    drift = Dynamics(lambda x, u: A @ x, 2, 0)
    # heterogeneous: even steps actuated, odd steps pure drift
    dyn_het = [act if t % 2 == 0 else drift for t in range(T - 1)]
    cost_act = Cost(lambda x, u: 0.1 * (x @ x + u @ u), 2, 1)
    cost_drift = Cost(lambda x, u: 0.1 * (x @ x), 2, 0)
    cost_term = Cost(lambda x, u: 0.1 * (x @ x), 2, 0)
    obj_het = [cost_act if t % 2 == 0 else cost_drift for t in range(T - 1)]
    obj_het += [cost_term]
    goal = Constraint(lambda x, u: x - GOAL, 2, 0)
    cons = [Constraint() for _ in range(T - 1)] + [goal]
    spec_het = build_spec(dyn_het, obj_het, cons)
    assert spec_het.nu == 1 and not bool(spec_het.u_mask[1].any())

    # homogeneous: odd-step actions exist but are inert; quadratic penalty
    # makes their optimum exactly 0, so both problems share the solution
    inert = Dynamics(lambda x, u: A @ x, 2, 1)
    dyn_hom = [act if t % 2 == 0 else inert for t in range(T - 1)]
    obj_hom = [cost_act for _ in range(T - 1)] + [cost_term]
    spec_hom = build_spec(dyn_hom, obj_hom, cons)

    sol_het = _solve(spec_het)
    sol_hom = _solve(spec_hom)
    assert float(sol_het.max_violation) <= 5e-3
    assert float(sol_hom.max_violation) <= 5e-3
    np.testing.assert_allclose(
        np.asarray(sol_het.xs), np.asarray(sol_hom.xs), atol=1e-6
    )
    # actuated steps agree; inert steps are exactly zero in both encodings
    us_het, us_hom = np.asarray(sol_het.us), np.asarray(sol_hom.us)
    np.testing.assert_allclose(us_het[::2], us_hom[::2], atol=1e-6)
    np.testing.assert_allclose(us_het[1::2], 0.0, atol=1e-12)  # masked rows
    np.testing.assert_allclose(us_hom[1::2], 0.0, atol=1e-6)
    # padded gain rows are exactly zero
    K = np.asarray(sol_het.K)
    np.testing.assert_array_equal(K[1::2], 0.0)


def test_state_dimension_changes_along_horizon():
    # R2 --lift--> R3 --mix--> R3 --proj--> R2, terminal goal in R2
    lift = Dynamics(
        lambda x, u: jnp.array([x[0], x[1], x[0] + x[1] + u[0]]), 2, 1,
    )
    mix3 = Dynamics(
        lambda x, u: jnp.array(
            [x[0] + 0.1 * x[2], x[1] + u[0], 0.5 * x[2] + u[1]]
        ),
        3, 2,
    )
    proj = Dynamics(lambda x, u: jnp.array([x[0] + u[0], x[1] + x[2]]), 3, 1)
    dynamics = [lift, mix3, proj]
    T = 4
    c2 = Cost(lambda x, u: 0.1 * (x @ x + u @ u), 2, 1)
    c3a = Cost(lambda x, u: 0.1 * (x @ x + u @ u), 3, 2)
    c3b = Cost(lambda x, u: 0.1 * (x @ x + u @ u), 3, 1)
    cterm = Cost(lambda x, u: 0.1 * (x @ x), 2, 0)
    objective = [c2, c3a, c3b, cterm]
    goal = Constraint(lambda x, u: x - jnp.array([0.5, -0.2]), 2, 0)
    constraints = [Constraint(), Constraint(), Constraint(), goal]
    spec = build_spec(dynamics, objective, constraints)
    assert spec.nx == 3 and spec.nu == 2
    assert list(spec.x_dims) == [2, 3, 3, 2]
    assert list(spec.u_dims) == [1, 2, 1]

    sol = _solve(
        spec, xs0=jnp.array([0.3, -0.1]),
        opts=Options(verbose=False, max_dual_updates=12),
    )
    assert float(sol.max_violation) <= 5e-3
    # padded state entries stay identically zero where masked
    xs = np.asarray(sol.xs)
    assert xs[0, 2] == 0.0 and xs[3, 2] == 0.0
