"""Failure isolation and determinism (SURVEY.md section 5).

- One pathological instance in a batch (divergence-prone dynamics) must not
  poison the others: per-instance regularization and NaN-rejecting line
  search isolate it (the reference's unchecked Cholesky would NaN everything,
  src/backward_pass.jl:69-73).
- Determinism: the jitted solve is bitwise-reproducible call-to-call.
"""

import jax
import jax.numpy as jnp
import numpy as np

from iterativelqr_tpu import Constraint, Cost, Dynamics, Options
from iterativelqr_tpu.core.spec import build_spec
from iterativelqr_tpu.models import particle
from iterativelqr_tpu.parallel import make_batched_solve_fn


def test_bad_instance_does_not_poison_batch():
    """Instance 2 starts at an exploding initial state for stiff dynamics;
    everyone else must still solve."""
    T = 11

    def stiff(x, u):
        # strongly unstable + saturating nonlinearity: diverges from large x
        return jnp.array(
            [x[0] + x[1] + 0.5 * x[0] ** 3, x[1] + u[0]], x.dtype
        )

    dyn = Dynamics(stiff, 2, 1)
    stage = Cost(lambda x, u: 0.1 * (x @ x + u @ u), 2, 1)
    term = Cost(lambda x, u: 0.1 * (x @ x), 2, 0)
    goal = Constraint(lambda x, u: x - jnp.array([0.3, 0.0]), 2, 0)
    spec = build_spec(
        [dyn] * (T - 1), [stage] * (T - 1) + [term],
        [Constraint() for _ in range(T - 1)] + [goal],
    )
    solve = jax.jit(make_batched_solve_fn(spec, Options(verbose=False)))

    B = 6
    x0 = jnp.array(
        [[0.1, 0.0], [0.2, -0.1], [80.0, 50.0], [0.0, 0.2], [-0.2, 0.1], [0.3, 0.0]]
    )
    xs = jnp.zeros((B, T, 2), jnp.float64).at[:, 0, :].set(x0)
    us = jnp.zeros((B, T - 1, 1), jnp.float64)
    ws = jnp.zeros((B, T, 0), jnp.float64)
    sol = solve(xs, us, ws)

    good = [0, 1, 3, 4, 5]
    viol = np.asarray(sol.max_violation)
    assert np.all(viol[good] <= 5e-3), f"good instances failed: {viol}"
    # the good instances' trajectories are finite regardless of instance 2
    assert np.all(np.isfinite(np.asarray(sol.xs)[good]))
    assert np.all(np.isfinite(np.asarray(sol.us)[good]))


def test_solve_is_deterministic():
    T = 11
    dynamics, objective, constraints, x1, xT = particle.problem(T)
    spec = build_spec(dynamics, objective, constraints)
    solve = jax.jit(make_batched_solve_fn(spec, Options(verbose=False)))
    B = 8
    x0 = jax.random.normal(jax.random.PRNGKey(5), (B, 2))
    xs = jnp.zeros((B, T, 2), jnp.float64).at[:, 0, :].set(x0)
    us = jnp.zeros((B, T - 1, 1), jnp.float64)
    ws = jnp.zeros((B, T, 0), jnp.float64)
    a = solve(xs, us, ws)
    b = solve(xs, us, ws)
    np.testing.assert_array_equal(np.asarray(a.xs), np.asarray(b.xs))
    np.testing.assert_array_equal(np.asarray(a.us), np.asarray(b.us))
    np.testing.assert_array_equal(
        np.asarray(a.max_violation), np.asarray(b.max_violation)
    )
