"""Parameter sensitivities of the optimal value: dJ*/dw.

The reference declares parameter gradients "coming soon" and allocates (but
never fills) the parameter-Jacobian buffers (reference: README.md:28,
src/data/model.jl:9,15 — SURVEY.md "unused knobs").  Here they ship, via the
adjoint/envelope identity: at a converged primal-dual solution, the total
derivative of the optimal value with respect to the per-timestep parameter
trajectory is the *partial* derivative of the Lagrangian

    L = sum_t [ g_t + lambda_t' c_t (+ AL penalty) ]
        + sum_t p_{t+1}' ( f_t(x_t, u_t, w_t) - x_{t+1} )

holding the trajectory, duals, and costates fixed — so one reverse-mode AD
sweep over the stage functions gives dJ*/dw for every timestep at once.  The
costates p are the value-function gradients from one backward pass at the
solution (already the Riccati by-product).

This makes warm-started MPC parameter tuning, homotopy/continuation schemes,
and sensitivity-aware batched sweeps first-class: under ``vmap`` the gradient
comes back for every instance in the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.options import Options
from ..core.spec import ProblemSpec
from . import al as al_ops
from . import derivatives as dv
from .backward import backward_pass


def costates(spec: ProblemSpec, options: Options, xs, us, ws, duals, penalty):
    """Value-function gradients [T, nx] at the solution (index 0 unused for
    the adjoint identity; p[t] is dV_t/dx_t of the AL-augmented problem)."""
    ineq = jnp.asarray(spec.ineq_mask)
    u_mask = jnp.asarray(spec.u_mask)
    with jax.default_matmul_precision("float32"):
        fx, fu = dv.dynamics_jacobians(spec, xs, us, ws)
        gx, gu = dv.cost_gradients(spec, xs, us, ws)
        gxx, guu, gux = dv.cost_hessians(spec, xs, us, ws)
        if spec.nc > 0:
            c = dv.constraint_values(spec, xs, us, ws)
            cx, cu = dv.constraint_jacobians(spec, xs, us, ws)
            dgx, dgu, dgxx, dguu, dgux = al_ops.al_gradient_terms(
                c, cx, cu, duals, penalty, ineq
            )
            gx, gu = gx + dgx, gu + dgu
            gxx, guu, gux = gxx + dgxx, guu + dguu, gux + dgux
        _, _, _, _, p, _, _ = backward_pass(
            fx, fu, gx, gu, gxx, guu, gux, u_mask,
            jnp.zeros((), xs.dtype), options,
        )
    # p[t] for t=0..T-2 from the recursion; terminal costate is the
    # (AL-augmented) terminal cost gradient
    return jnp.concatenate([p, gx[-1:]], axis=0)


def parameter_gradient(
    spec: ProblemSpec, options: Options, xs, us, ws, duals, penalty
):
    """dJ*/dws, [T, npar]: gradient of the optimal value w.r.t. the parameter
    trajectory at a converged solution ``(xs, us, duals, penalty)``.

    Pure and jittable; compose with ``jax.vmap`` for batched solutions.
    """
    ineq = jnp.asarray(spec.ineq_mask)
    p = costates(spec, options, xs, us, ws, duals, penalty)

    def lagrangian(ws_var):
        J = dv.total_cost(spec, xs, us, ws_var)
        if spec.nc > 0:
            c = dv.constraint_values(spec, xs, us, ws_var)
            J = J + al_ops.al_terms(c, duals, penalty, ineq)
        f_all = dv.dynamics_values(spec, xs, us, ws_var)  # [T-1, nx]
        # adjoint term: x_{t+1} is constant w.r.t. ws, so only f_t matters
        J = J + jnp.sum(p[1:] * f_all)
        return J

    with jax.default_matmul_precision("float32"):
        return jax.grad(lagrangian)(ws)


def solution_parameter_gradient(spec: ProblemSpec, options: Options, solution, ws):
    """Convenience wrapper taking a ``Solution`` pytree."""
    return parameter_gradient(
        spec, options, solution.xs, solution.us, ws,
        solution.duals, solution.penalty,
    )
