"""Pendulum swing-up (reference: test/dynamics.jl:5-16 uses this model for the
derivative tests; the swing-up problem is an extra capability demo)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.spec import Constraint, Cost, Dynamics

NUM_STATE = 2
NUM_ACTION = 1

MASS = 1.0
LENGTH = 0.5
GRAVITY = 9.81
DAMPING = 0.1


def pendulum_continuous(x, u):
    # reference test/dynamics.jl: a simple damped pendulum
    return jnp.array(
        [
            x[1],
            (u[0] - DAMPING * x[1] - MASS * GRAVITY * LENGTH * jnp.sin(x[0]))
            / (MASS * LENGTH**2),
        ]
    )


def pendulum_discrete(x, u, h=0.05):
    return x + h * pendulum_continuous(x + 0.5 * h * pendulum_continuous(x, u), u)


def problem(T: int = 51):
    xT = jnp.array([jnp.pi, 0.0])

    dyn = Dynamics(pendulum_discrete, NUM_STATE, NUM_ACTION)
    dynamics = [dyn] * (T - 1)

    stage = Cost(
        lambda x, u: 0.1 * jnp.dot(x[1:], x[1:]) + 0.1 * jnp.dot(u, u),
        NUM_STATE,
        NUM_ACTION,
    )
    term = Cost(lambda x, u: 0.1 * jnp.dot(x[1:], x[1:]), NUM_STATE, 0)
    objective = [stage] * (T - 1) + [term]

    goal = Constraint(lambda x, u: x - xT.astype(x.dtype), NUM_STATE, 0)
    constraints = [Constraint() for _ in range(T - 1)] + [goal]

    x1 = jnp.zeros(NUM_STATE)
    return dynamics, objective, constraints, x1, xT
