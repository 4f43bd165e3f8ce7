"""Receding-horizon MPC on top of the pure solve function.

The reference's only state carry-over is manual warm starting
(``initialize_states!/controls!``, reference src/solver.jl:56-66), and
BASELINE.json frames the target workload as "real-time MPC budgets".  Because
the solver here is a pure ``(state, problem) -> state`` function, an MPC
controller is just a jittable step: shift the previous solution one step,
inject the measured state, re-solve warm-started (optionally carrying AL
duals), and emit the first action.  Compose with ``vmap``/sharding for fleets
of controllers.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .options import Options
from .solve import Solution, make_solve_fn
from .spec import ProblemSpec


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MPCState:
    """Warm-start carry between MPC steps (an explicit pytree — saving and
    restoring it is checkpoint/resume)."""

    xs: jax.Array       # [T, nx] last solved nominal states
    us: jax.Array       # [T-1, nu] last solved nominal actions
    duals: jax.Array    # [T, nc]
    penalty: jax.Array  # [T, nc]


class MPCStep(NamedTuple):
    state: MPCState
    action: jax.Array     # [nu] first action of the re-solved plan
    solution: Solution


def make_mpc_controller(
    spec: ProblemSpec,
    options: Options = Options(),
    carry_duals: bool = False,
    shift_fill: str = "repeat",  # "repeat" last action | "zero"
    step_objective_tolerance: Optional[float] = 1.0e-8,
):
    """Build ``init(xs, us, ws) -> MPCState`` and
    ``step(state, x_measured, ws) -> MPCStep`` (both pure/jittable).

    Each step: shift the previous plan by one timestep (warm start), clamp the
    initial state to the measurement, re-solve.  With ``carry_duals`` the AL
    multipliers shift too and seed the next solve (penalties restart at the
    initial penalty so a stale-dual seed cannot lock in a huge penalty).

    Warm-started re-solves need *tighter* stopping tolerances than cold
    solves: under the reference defaults (|dJ| < 1e-3) a shifted plan looks
    converged after one iteration and the applied action is one step stale.
    ``step_objective_tolerance`` therefore OVERRIDES ``options.objective_tolerance``
    for the MPC solve (default 1e-8); pass ``None`` to keep the options' value
    (only do this if you've set it tight yourself).
    """
    if step_objective_tolerance is not None:
        options = dataclasses.replace(
            options, objective_tolerance=step_objective_tolerance
        )
    solve = make_solve_fn(spec, options, dual_warm_start=True)
    nc = spec.nc

    def init(xs, us, ws=None) -> MPCState:
        dtype = xs.dtype
        return MPCState(
            xs=xs,
            us=us,
            duals=jnp.zeros((spec.T, nc), dtype),
            penalty=jnp.full((spec.T, nc), options.initial_constraint_penalty, dtype),
        )

    def step(state: MPCState, x_measured, ws) -> MPCStep:
        dtype = state.xs.dtype
        # shift: plan_{t} <- plan_{t+1}; fill the tail
        tail = state.us[-1:] if shift_fill == "repeat" else jnp.zeros_like(state.us[-1:])
        us = jnp.concatenate([state.us[1:], tail], axis=0)
        # re-roll the shifted controls from the measurement: splicing the
        # measured state into the old plan leaves a dynamically inconsistent
        # nominal whose (underestimated) objective makes the Armijo test
        # reject every candidate — the solver would return the stale plan
        from ..ops.rollout import open_loop_rollout

        xs = open_loop_rollout(spec, x_measured.astype(dtype), us, ws)
        if carry_duals and nc > 0:
            duals = jnp.concatenate([state.duals[1:], state.duals[-1:]], axis=0)
        else:
            duals = jnp.zeros((spec.T, nc), dtype)
        penalty = jnp.full(
            (spec.T, nc), options.initial_constraint_penalty, dtype
        )
        sol = solve(xs, us, ws, duals, penalty)
        new_state = MPCState(
            xs=sol.xs, us=sol.us, duals=sol.duals, penalty=penalty
        )
        return MPCStep(state=new_state, action=sol.us[0], solution=sol)

    return init, step
