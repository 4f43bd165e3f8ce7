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
    K: jax.Array        # [T-1, nu, nx] last solved feedback gains
    duals: jax.Array    # [T, nc]
    penalty: jax.Array  # [T, nc]


class MPCStep(NamedTuple):
    state: MPCState
    action: jax.Array     # [nu] first action of the re-solved plan
    solution: Solution


def make_mpc_controller(
    spec: ProblemSpec,
    options: Options = Options(),
    carry_duals: bool = True,
    carry_penalty: bool = True,
    penalty_carry_cap: float = 1.0e4,
    shift_fill: str = "repeat",  # "repeat" last action | "zero"
    step_objective_tolerance: Optional[float] = 1.0e-4,
    max_step_iterations: Optional[int] = None,
    constraint_aware: bool = True,
):
    """Build ``init(xs, us, ws) -> MPCState`` and
    ``step(state, x_measured, ws) -> MPCStep`` (both pure/jittable).

    Each step: shift the previous plan (trajectory, gains, and — by default —
    AL duals and penalties) one timestep, re-roll it CLOSED-LOOP from the
    measured state, re-solve warm-started, emit the first action.

    Warm-start policy (all measured on acrobot T=51, 0.002-sigma state
    disturbance per step; see benchmarks/mpc_bench.py):

    * ``carry_duals`` + ``carry_penalty``: restarting the penalty at the
      initial value forces the AL schedule to re-escalate EVERY step (mean
      ~300 inner iterations/step); carrying both converges in one AL round
      (~15).  ``penalty_carry_cap`` bounds the carried penalty because the
      1e5+ range makes the inner problem needlessly stiff (tiny Armijo
      steps); 1e4 measured best.
    * ``step_objective_tolerance`` overrides ``options.objective_tolerance``
      for step re-solves (default 1e-4; the cold-solve default 1e-3 can
      accept a barely-improved plan, while 1e-6 and tighter buys no closed-
      loop quality and triples iterations).  Pass ``None`` to keep the
      options' value.
    * ``max_step_iterations``: optional hard per-step TOTAL iteration budget
      (real-time-iteration mode), mapped to ``options.max_total_iterations``:
      exhausting it truncates the solve without firing a dual update, so a
      capped step degrades to a shorter warm solve.  (Mapping it to
      ``max_iterations`` — a PER-AL-ROUND cap — was measured to diverge:
      each truncated round still fired its mid-convergence dual ascent and
      acrobot MPC compounded to violation 3e7 while running slower.)  The
      budget bounds worst-case latency at some transient-quality cost.
    * ``constraint_aware`` (default True): step re-solves use the
      constraint-aware line-search acceptance
      (``options.constraint_aware_acceptance``) — among Armijo-accepted
      candidates, prefer the largest step that does not worsen the max
      violation.  Measured on the budget-8 acrobot harness
      (tests/test_mpc.py scenario): the cold transient settles at step 6
      with NO feasibility re-excursions (plain Armijo re-excurses to
      violation 0.039 through step 12), same steady envelope.  Pass False
      for the raw Armijo acceptance.
    """
    if constraint_aware:
        options = dataclasses.replace(
            options, constraint_aware_acceptance=True
        )
    if step_objective_tolerance is not None:
        options = dataclasses.replace(
            options, objective_tolerance=step_objective_tolerance
        )
    if max_step_iterations is not None:
        options = dataclasses.replace(
            options, max_total_iterations=max_step_iterations
        )
    solve = make_solve_fn(spec, options, dual_warm_start=True)
    nc = spec.nc

    def init(xs, us, ws=None) -> MPCState:
        dtype = xs.dtype
        return MPCState(
            xs=xs,
            us=us,
            K=jnp.zeros((spec.T - 1, spec.nu, spec.nx), dtype),
            duals=jnp.zeros((spec.T, nc), dtype),
            penalty=jnp.full((spec.T, nc), options.initial_constraint_penalty, dtype),
        )

    def step(state: MPCState, x_measured, ws) -> MPCStep:
        dtype = state.xs.dtype
        # shift: plan_{t} <- plan_{t+1}; fill the tail
        tail = state.us[-1:] if shift_fill == "repeat" else jnp.zeros_like(state.us[-1:])
        us = jnp.concatenate([state.us[1:], tail], axis=0)
        xs_shift = jnp.concatenate([state.xs[1:], state.xs[-1:]], axis=0)
        K_shift = jnp.concatenate([state.K[1:], state.K[-1:]], axis=0)
        # Re-roll the shifted plan from the measurement CLOSED-LOOP around the
        # old nominal (u_t = us_t + K_t (x_t - xs_shift_t)).  Two failure
        # modes this avoids (both measured): splicing the measured state into
        # the old plan leaves a dynamically inconsistent nominal whose
        # underestimated objective wedges the Armijo test; an OPEN-loop
        # re-roll of the shifted controls diverges over the horizon for
        # unstable plants (acrobot: violations reached 1e186), burying the
        # warm start.  The feedback re-roll keeps the nominal consistent AND
        # near the previous optimum, so the warm solve does few iterations.
        from ..ops.rollout import closed_loop_rollout

        xs, us = closed_loop_rollout(
            spec, xs_shift, us, ws,
            K_shift, jnp.zeros_like(us), 0.0,
            x0=x_measured.astype(dtype),
        )
        if carry_duals and nc > 0:
            duals = jnp.concatenate([state.duals[1:], state.duals[-1:]], axis=0)
        else:
            duals = jnp.zeros((spec.T, nc), dtype)
        if carry_penalty and nc > 0:
            penalty = jnp.minimum(
                jnp.concatenate([state.penalty[1:], state.penalty[-1:]], axis=0),
                jnp.asarray(penalty_carry_cap, dtype),
            )
        else:
            penalty = jnp.full(
                (spec.T, nc), options.initial_constraint_penalty, dtype
            )
        sol = solve(xs, us, ws, duals, penalty)
        new_state = MPCState(
            xs=sol.xs, us=sol.us, K=sol.K, duals=sol.duals, penalty=sol.penalty
        )
        return MPCStep(state=new_state, action=sol.us[0], solution=sol)

    return init, step
