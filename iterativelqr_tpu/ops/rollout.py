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


def closed_loop_rollout(spec: ProblemSpec, xbar, ubar, ws, K, k, alpha):
    """Roll out the policy from xbar[0]. Returns (xs [T,nx], us [T-1,nu])."""
    branches = spec.dyn_eval
    multi = len(branches) > 1
    tidx = jnp.asarray(spec.dyn_tidx) if multi else None

    def step(x, inp):
        if multi:
            ti, xb, ub, w, K_t, k_t = inp
        else:
            xb, ub, w, K_t, k_t = inp
        u = ub + K_t @ (x - xb) + alpha * k_t
        if multi:
            xn = jax.lax.switch(ti, branches, x, u, w)
        else:
            xn = branches[0](x, u, w)
        return xn, (x, u)

    inputs = (xbar[:-1], ubar, ws[:-1], K, k)
    if multi:
        inputs = (tidx,) + inputs
    x_last, (xs_head, us) = jax.lax.scan(step, xbar[0], inputs)
    xs = jnp.concatenate([xs_head, x_last[None]], axis=0)
    return xs, us


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
