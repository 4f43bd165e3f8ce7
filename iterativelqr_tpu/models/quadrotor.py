"""Quadrotor waypoint flight — larger model family beyond the reference
(12 states, 4 controls): exercises the solver at dimensions where the
unrolled small-matrix kernels run 12x12 / 4x4 blocks.

State: position p (3), Euler angles (roll, pitch, yaw) (3), velocity v (3),
body angular rates w (3).  Controls: four rotor thrusts.  Constraints: rotor
thrust bounds (inequality) and a terminal hover at the goal (equality).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.spec import Constraint, Cost, Dynamics

NUM_STATE = 12
NUM_ACTION = 4

MASS = 1.0
GRAVITY = 9.81
ARM = 0.2          # rotor arm length
KT = 0.02          # yaw torque / thrust ratio
# plain tuple: a module-level jnp.array would initialize the JAX backend at
# import time, which breaks jax.distributed.initialize in multi-process entry
INERTIA = (0.01, 0.01, 0.02)


def quadrotor_continuous(x, u):
    p, ang, v, w = x[0:3], x[3:6], x[6:9], x[9:12]
    roll, pitch, yaw = ang[0], ang[1], ang[2]
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)

    thrust = jnp.sum(u)
    # body-z axis in world frame (ZYX Euler)
    bz = jnp.array(
        [cy * sp * cr + sy * sr, sy * sp * cr - cy * sr, cp * cr], x.dtype
    )
    acc = bz * (thrust / MASS) - jnp.array([0.0, 0.0, GRAVITY], x.dtype)

    # torques from rotor layout (x-configuration)
    tau = jnp.array(
        [
            ARM * (u[1] - u[3]),
            ARM * (u[2] - u[0]),
            KT * (u[0] - u[1] + u[2] - u[3]),
        ],
        x.dtype,
    )
    inertia = jnp.asarray(INERTIA, x.dtype)
    wdot = (tau - jnp.cross(w, inertia * w)) / inertia

    # Euler angle kinematics (small-angle-safe form)
    t_pitch = jnp.tan(pitch)
    angdot = jnp.array(
        [
            w[0] + sr * t_pitch * w[1] + cr * t_pitch * w[2],
            cr * w[1] - sr * w[2],
            (sr * w[1] + cr * w[2]) / cp,
        ],
        x.dtype,
    )
    return jnp.concatenate([v, angdot, acc, wdot])


def quadrotor_discrete(x, u, h=0.05):
    # explicit midpoint (RK2)
    return x + h * quadrotor_continuous(x + 0.5 * h * quadrotor_continuous(x, u), u)


def problem(
    T: int = 41,
    goal=(1.0, 1.0, 1.0),
    u_min: float = 0.0,
    u_max: float = 6.0,
):
    xT = jnp.zeros(NUM_STATE).at[0:3].set(jnp.asarray(goal))
    hover = MASS * GRAVITY / 4.0

    dyn = Dynamics(quadrotor_discrete, NUM_STATE, NUM_ACTION)
    dynamics = [dyn] * (T - 1)

    def stage_cost(x, u):
        e = x - xT.astype(x.dtype)
        du = u - hover
        return (
            1.0 * jnp.dot(e[0:3], e[0:3])
            + 0.5 * jnp.dot(e[3:6], e[3:6])
            + 0.1 * jnp.dot(e[6:12], e[6:12])
            + 0.05 * jnp.dot(du, du)
        )

    def term_cost(x, u):
        e = x - xT.astype(x.dtype)
        return 1.0 * jnp.dot(e, e)

    objective = [Cost(stage_cost, NUM_STATE, NUM_ACTION)] * (T - 1) + [
        Cost(term_cost, NUM_STATE, 0)
    ]

    def limits(x, u):
        return jnp.concatenate([u_min - u, u - u_max])

    def terminal(x, u):
        return x - xT.astype(x.dtype)

    stage_con = Constraint(
        limits, NUM_STATE, NUM_ACTION, indices_inequality=range(8)
    )
    goal_con = Constraint(terminal, NUM_STATE, 0)
    constraints = [stage_con] * (T - 1) + [goal_con]

    x1 = jnp.zeros(NUM_STATE)
    return dynamics, objective, constraints, x1, xT


def hover_controls(T: int = 41):
    return [jnp.full((NUM_ACTION,), MASS * GRAVITY / 4.0)] * (T - 1)
