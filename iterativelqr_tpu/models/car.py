"""Unicycle car with obstacle avoidance (reference: examples/car.jl, test/car.jl).

T=51, 3 states, 2 actions; control box + circular-obstacle inequality
constraints at each stage, terminal goal equality + obstacle inequality.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.spec import Constraint, Cost, Dynamics

NUM_STATE = 3
NUM_ACTION = 2


def car_continuous(x, u):
    return jnp.array([u[0] * jnp.cos(x[2]), u[0] * jnp.sin(x[2]), u[1]])


def car_discrete(x, u, h=0.1):
    # explicit midpoint (RK2), reference: examples/car.jl:25-28
    return x + h * car_continuous(x + 0.5 * h * car_continuous(x, u), u)


def problem(
    T: int = 51,
    x_goal=(1.0, 1.0, 0.0),
    u_lower=-5.0,
    u_upper=5.0,
    obstacle_center=(0.5, 0.5),
    obstacle_radius=0.1,
):
    xT = jnp.asarray(x_goal)
    p_obs = jnp.asarray(obstacle_center)
    r_obs = obstacle_radius

    dyn = Dynamics(car_discrete, NUM_STATE, NUM_ACTION)
    dynamics = [dyn] * (T - 1)

    stage_cost = Cost(
        lambda x, u: jnp.dot(x - xT.astype(x.dtype), x - xT.astype(x.dtype))
        + 1.0e-2 * jnp.dot(u, u),
        NUM_STATE,
        NUM_ACTION,
    )
    term_cost = Cost(
        lambda x, u: 1000.0 * jnp.dot(x - xT.astype(x.dtype), x - xT.astype(x.dtype)),
        NUM_STATE,
        0,
    )
    objective = [stage_cost] * (T - 1) + [term_cost]

    ul = jnp.full(NUM_ACTION, u_lower)
    uu = jnp.full(NUM_ACTION, u_upper)

    def stage_con(x, u):
        e = x[:2] - p_obs.astype(x.dtype)
        return jnp.concatenate(
            [
                ul.astype(x.dtype) - u,  # control lower bound
                u - uu.astype(x.dtype),  # control upper bound
                jnp.array([r_obs**2 - jnp.dot(e, e)], x.dtype),  # obstacle
            ]
        )

    def term_con(x, u):
        e = x[:2] - p_obs.astype(x.dtype)
        return jnp.concatenate(
            [
                x - xT.astype(x.dtype),  # goal equality
                jnp.array([r_obs**2 - jnp.dot(e, e)], x.dtype),  # obstacle
            ]
        )

    stage = Constraint(
        stage_con, NUM_STATE, NUM_ACTION, indices_inequality=range(5)
    )
    term = Constraint(term_con, NUM_STATE, NUM_ACTION, indices_inequality=[3])
    constraints = [stage] * (T - 1) + [term]

    x1 = jnp.zeros(NUM_STATE)
    return dynamics, objective, constraints, x1, xT


def initial_controls(T: int = 51):
    """Reference initialization u_t = 1e-2 * [1, 0.1] (examples/car.jl:36)."""
    return [jnp.array([1.0e-2, 1.0e-3])] * (T - 1)
