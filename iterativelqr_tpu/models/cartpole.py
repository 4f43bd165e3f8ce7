"""Cartpole swing-up — extra model family beyond the reference examples,
demonstrating control-limit inequality constraints on a 4-state system."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.spec import Constraint, Cost, Dynamics

NUM_STATE = 4
NUM_ACTION = 1

MASS_CART = 1.0
MASS_POLE = 0.2
LENGTH = 0.5
GRAVITY = 9.81


def cartpole_continuous(x, u):
    _, th, xd, thd = x[0], x[1], x[2], x[3]
    f = u[0]
    s, c = jnp.sin(th), jnp.cos(th)
    total = MASS_CART + MASS_POLE
    tmp = (f + MASS_POLE * LENGTH * thd**2 * s) / total
    thdd = (GRAVITY * s - c * tmp) / (
        LENGTH * (4.0 / 3.0 - MASS_POLE * c**2 / total)
    )
    xdd = tmp - MASS_POLE * LENGTH * thdd * c / total
    return jnp.array([xd, thd, xdd, thdd])


def cartpole_discrete(x, u, h=0.05):
    return x + h * cartpole_continuous(x + 0.5 * h * cartpole_continuous(x, u), u)


def problem(T: int = 101, u_limit: float = 10.0, shaping_weight: float = 5.0):
    """Swing-up to the upright (any winding of theta = pi).

    The terminal angle constraint is the wrapped form sin((theta - pi)/2) = 0
    — zero exactly at odd multiples of pi, nonzero at the hanging state, with
    a nondegenerate gradient there; a raw equality theta = pi traps the solver
    on the wrong winding side.  The stage cost shapes toward upright via
    1 + cos(theta).
    """
    xT = jnp.array([0.0, jnp.pi, 0.0, 0.0])

    dyn = Dynamics(cartpole_discrete, NUM_STATE, NUM_ACTION)
    dynamics = [dyn] * (T - 1)

    stage = Cost(
        lambda x, u: 0.01 * jnp.dot(u, u)
        + 0.1 * jnp.dot(x[2:], x[2:])
        + shaping_weight * (1.0 + jnp.cos(x[1]))
        + 0.1 * x[0] ** 2,
        NUM_STATE,
        NUM_ACTION,
    )
    term = Cost(lambda x, u: 0.1 * jnp.dot(x[2:], x[2:]), NUM_STATE, 0)
    objective = [stage] * (T - 1) + [term]

    def stage_con(x, u):
        return jnp.array([-u_limit - u[0], u[0] - u_limit], x.dtype)

    def terminal_con(x, u):
        return jnp.array(
            [x[0], jnp.sin((x[1] - jnp.pi) / 2.0), x[2], x[3]], x.dtype
        )

    limits = Constraint(stage_con, NUM_STATE, NUM_ACTION, indices_inequality=[0, 1])
    goal = Constraint(terminal_con, NUM_STATE, 0)
    constraints = [limits] * (T - 1) + [goal]

    x1 = jnp.zeros(NUM_STATE)
    return dynamics, objective, constraints, x1, xT


def swingup_controls(T):
    """Energy-pumping warm-start controls: a slow sinusoid u(t) =
    sin(2*pi*t / 50).

    Measured init-protocol comparison (B=256 random initial states, parity
    defaults): constant 0.1 controls leave ~0.4% of instances in the
    pendulum-down local minimum (terminal violation ~0.95 after all dual
    rounds); this sinusoid solves 100% with ~35% fewer mean iterations (83
    vs 127).  Swing-up basins reward an initial trajectory that already
    oscillates.
    """
    import numpy as np

    t = np.arange(T - 1, dtype=np.float64)
    return np.sin(2.0 * np.pi * t / 50.0)[:, None] * np.ones(
        (1, NUM_ACTION)
    )
