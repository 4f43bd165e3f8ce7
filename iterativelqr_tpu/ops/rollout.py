"""Trajectory rollouts.

Closed-loop rollout under the time-varying affine policy
u_t = ubar_t + K_t (x_t - xbar_t) + alpha * k_t (reference: src/rollout.jl:1-31)
as a ``lax.scan`` — the horizon recursion is inherently sequential; parallelism
comes from the batch axis (vmap/sharding) and from evaluating all line-search
step sizes at once (ops/forward.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.spec import Dynamics, ProblemSpec
from . import linalg_small


def closed_loop_rollout(
    spec: ProblemSpec, xbar, ubar, ws, K, k, alpha, unroll=1, x0=None
):
    """Roll out the policy from ``x0`` (default ``xbar[0]``).
    Returns (xs [T,nx], us [T-1,nu]).  ``x0`` lets MPC re-roll the shifted
    plan from a measured state while still tracking the old nominal."""
    branches = spec.dyn_eval
    multi = len(branches) > 1
    tidx = jnp.asarray(spec.dyn_tidx) if multi else None

    def step(x, inp):
        if multi:
            ti, xb, ub, w, K_t, k_t = inp
        else:
            xb, ub, w, K_t, k_t = inp
        u = ub + linalg_small.matvec(K_t, x - xb) + alpha * k_t
        if multi:
            xn = jax.lax.switch(ti, branches, x, u, w)
        else:
            xn = branches[0](x, u, w)
        return xn, (x, u)

    inputs = (xbar[:-1], ubar, ws[:-1], K, k)
    if multi:
        inputs = (tidx,) + inputs
    x_start = xbar[0] if x0 is None else x0
    x_last, (xs_head, us) = jax.lax.scan(step, x_start, inputs, unroll=unroll)
    xs = jnp.concatenate([xs_head, x_last[None]], axis=0)
    return xs, us


def rollout_with_al_cost(
    spec: ProblemSpec, xbar, ubar, ws, K, k, alpha, duals, penalty, unroll=1,
    cost_only: bool = False, with_viol: bool = False,
):
    """Closed-loop rollout with the AL objective accumulated inside the scan.

    Fuses the line search's cost + constraint evaluation into the rollout loop
    body so no candidate trajectory is re-read from HBM for a separate
    objective pass (the dominant line-search cost at large batch).  Returns
    (xs [T,nx], us [T-1,nu], J scalar).  Constraint values of the winning
    candidate are re-evaluated once by the caller.

    With ``cost_only`` the trajectory is NOT emitted (the scan carries only
    (x, J)) and the returns are (None, None, J, None): candidate step sizes
    are scored without writing [n_alpha, T, nx] stacks to HBM — the line
    search re-rolls the single winning candidate afterwards (ops/forward.py).
    Otherwise returns (xs, us, J, c [T, nc]) with the constraint values
    emitted from the same in-scan evaluations that built the AL objective.

    With ``with_viol`` a fifth return is appended: the trajectory's max
    constraint violation (Inf-norm, eq/ineq rule of ops/al.py
    ``max_violation``), accumulated in the scan carry — this is what the
    constraint-aware line-search acceptance scores candidates with
    (options.py ``constraint_aware_acceptance``), at no extra rollout.
    """
    from . import al as al_ops

    dyn_branches = spec.dyn_eval
    cost_branches = spec.cost_eval
    con_branches = spec.con_eval
    multi_d = len(dyn_branches) > 1
    multi_g = len(cost_branches) > 1
    multi_c = len(con_branches) > 1
    nc = spec.nc
    ineq = jnp.asarray(spec.ineq_mask)
    cmask = jnp.asarray(spec.c_mask)
    dtype = xbar.dtype
    track_viol = with_viol and nc > 0

    def al_term(c_t, lam_t, rho_t, ineq_t):
        inactive = ineq_t & (c_t < 0.0) & (lam_t == 0.0)
        a = jnp.where(inactive, 0.0, 1.0).astype(c_t.dtype)
        return jnp.sum(lam_t * c_t) + 0.5 * jnp.sum(a * rho_t * c_t * c_t)

    def viol_of(c_t, ineq_t, cm_t):
        v = jnp.where(ineq_t, jnp.maximum(c_t, 0.0), jnp.abs(c_t))
        return jnp.max(jnp.where(cm_t, v, 0.0))

    def step(carry, inp):
        if track_viol:
            x, J, viol = carry
        else:
            x, J = carry
        (td, tg, tc, xb, ub, w, K_t, k_t, lam_t, rho_t, ineq_t, cm_t) = inp
        u = ub + linalg_small.matvec(K_t, x - xb) + alpha * k_t
        g = (
            jax.lax.switch(tg, cost_branches, x, u, w)
            if multi_g
            else cost_branches[0](x, u, w)
        )
        J = J + g
        c_t = None
        if nc > 0:
            c_t = (
                jax.lax.switch(tc, con_branches, x, u, w)
                if multi_c
                else con_branches[0](x, u, w)
            )
            J = J + al_term(c_t, lam_t, rho_t, ineq_t)
            if track_viol:
                viol = jnp.maximum(viol, viol_of(c_t, ineq_t, cm_t))
        xn = (
            jax.lax.switch(td, dyn_branches, x, u, w)
            if multi_d
            else dyn_branches[0](x, u, w)
        )
        # cost_only emits a scalar dummy instead of an empty pytree: a scan
        # with no per-step outputs under unroll>1 tickled an XLA CPU
        # miscompilation (stale carry values + heap corruption)
        if cost_only:
            ys = jnp.zeros((), dtype)
        elif nc > 0:
            ys = (x, u, c_t)
        else:
            ys = (x, u)
        carry_out = (xn, J, viol) if track_viol else (xn, J)
        return carry_out, ys

    T = spec.T
    td = jnp.asarray(spec.dyn_tidx)
    tg = jnp.asarray(spec.cost_tidx[: T - 1])
    tc = jnp.asarray(spec.con_tidx[: T - 1])
    inputs = (
        td, tg, tc, xbar[:-1], ubar, ws[:-1], K, k,
        duals[:-1], penalty[:-1], ineq[:-1], cmask[:-1],
    )
    carry0 = (xbar[0], jnp.zeros((), dtype))
    if track_viol:
        carry0 = carry0 + (jnp.zeros((), dtype),)
    carry_end, ys = jax.lax.scan(step, carry0, inputs, unroll=unroll)
    if track_viol:
        x_last, J, viol = carry_end
    else:
        x_last, J = carry_end
    c_head = None
    if cost_only:
        xs = us = None
        del ys
    elif nc > 0:
        xs_head, us, c_head = ys
        xs = jnp.concatenate([xs_head, x_last[None]], axis=0)
    else:
        xs_head, us = ys
        xs = jnp.concatenate([xs_head, x_last[None]], axis=0)

    # terminal stage: u = 0 (terminal stage functions have num_action == 0)
    u0 = jnp.zeros((spec.nu,), dtype)
    gT = spec.cost_eval[spec.cost_tidx[-1]](x_last, u0, ws[-1])
    J = J + gT
    c = None
    if nc > 0:
        cT = spec.con_eval[spec.con_tidx[-1]](x_last, u0, ws[-1])
        J = J + al_term(cT, duals[-1], penalty[-1], ineq[-1])
        if track_viol:
            viol = jnp.maximum(viol, viol_of(cT, ineq[-1], cmask[-1]))
        if not cost_only:
            c = jnp.concatenate([c_head, cT[None]], axis=0)
    elif not cost_only:
        c = jnp.zeros((T, 0), dtype)
    if with_viol:
        if nc == 0:
            viol = jnp.zeros((), dtype)
        return xs, us, J, c, viol
    return xs, us, J, c


def open_loop_rollout(spec: ProblemSpec, x1, us, ws):
    """Open-loop rollout (jittable): x_{t+1} = f_t(x_t, u_t, w_t)."""
    zK = jnp.zeros((spec.T - 1, spec.nu, spec.nx), x1.dtype)
    zk = jnp.zeros((spec.T - 1, spec.nu), x1.dtype)
    xbar = jnp.zeros((spec.T, spec.nx), x1.dtype).at[0].set(x1)
    xs, _ = closed_loop_rollout(spec, xbar, us, ws, zK, zk, 0.0)
    return xs


def rollout(
    dynamics: Sequence[Dynamics],
    initial_state,
    actions,
    parameters: Optional[Sequence] = None,
):
    """User-facing open-loop rollout for initialization
    (reference: src/rollout.jl:33-42).  Returns a list of per-timestep states.
    """
    x = jnp.asarray(initial_state, dtype=jnp.result_type(float))
    states = [x]
    for t, d in enumerate(dynamics):
        w = None if parameters is None else parameters[t]
        x = jnp.asarray(d(x, jnp.asarray(actions[t], x.dtype), w))
        states.append(x)
    return states
