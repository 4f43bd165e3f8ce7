"""Double-integrator particle (reference: examples/particle.jl, README quickstart).

T=11, 2 states, 1 action, quadratic costs, terminal equality x_T = goal.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.spec import Constraint, Cost, Dynamics

NUM_STATE = 2
NUM_ACTION = 1


def particle_discrete(x, u):
    A = jnp.array([[1.0, 1.0], [0.0, 1.0]], x.dtype)
    B = jnp.array([0.0, 1.0], x.dtype)
    return A @ x + B * u[0]


def problem(T: int = 11, x_goal=(1.0, 0.0)):
    """Build (dynamics, objective, constraints, x1, xT) per examples/particle.jl."""
    xT = jnp.asarray(x_goal)
    dyn = Dynamics(particle_discrete, NUM_STATE, NUM_ACTION)
    dynamics = [dyn] * (T - 1)

    stage = Cost(
        lambda x, u: 0.1 * jnp.dot(x, x) + 0.1 * jnp.dot(u, u),
        NUM_STATE,
        NUM_ACTION,
    )
    term = Cost(lambda x, u: 0.1 * jnp.dot(x, x), NUM_STATE, 0)
    objective = [stage] * (T - 1) + [term]

    goal = Constraint(lambda x, u: x - xT.astype(x.dtype), NUM_STATE, 0)
    constraints = [Constraint() for _ in range(T - 1)] + [goal]

    x1 = jnp.zeros(NUM_STATE)
    return dynamics, objective, constraints, x1, xT
