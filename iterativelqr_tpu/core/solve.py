"""Solver drivers: inner iLQR loop and outer augmented-Lagrangian loop.

Functional re-design of the reference drivers (reference: src/solve.jl):

* ``ilqr`` — the inner unconstrained minimization (src/solve.jl:1-51) as a
  ``lax.while_loop``: line search, fresh derivatives, regularized backward
  pass, convergence on Lagrangian-gradient norm / objective decrease /
  line-search failure — same criteria, same defaults.
* ``al_solve`` — the outer dual loop (src/solve.jl:88-129): inner solve,
  violation check, dual ascent + penalty scaling, optional user callback for
  continuation schemes.
* Unconstrained problems are simply AL problems with zero constraint rows:
  the violation is identically zero so the outer loop exits after one inner
  solve, replacing the reference's type-dispatch (src/solve.jl:137-143) with a
  single compiled program.

The whole solve is one jitted program; under ``jax.vmap`` the while-loops mask
per-instance automatically, so a batch finishes when its last instance
converges and converged instances stop changing (SURVEY.md section 7).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import al as al_ops
from ..ops import derivatives as dv
from ..ops.backward import backward_pass
from ..ops.forward import armijo_slope, line_search, trajectory_sensitivities
from .options import Options
from .spec import ProblemSpec


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Solution:
    """Result pytree of a solve (padded arrays; see ProblemSpec masks)."""

    xs: jax.Array  # [T, nx] nominal states
    us: jax.Array  # [T-1, nu] nominal actions
    K: jax.Array  # [T-1, nu, nx] feedback gains
    k: jax.Array  # [T-1, nu] feedforward
    objective: jax.Array  # final (augmented) objective
    gradient_norm: jax.Array  # inf-norm of the Lagrangian gradient
    max_violation: jax.Array  # inf-norm constraint violation
    status: jax.Array  # last line search succeeded
    iterations: jax.Array  # total inner iterations
    al_iterations: jax.Array  # outer dual updates performed
    step_size: jax.Array  # last accepted step size
    duals: jax.Array  # [T, nc]
    penalty: jax.Array  # [T, nc]
    reg: jax.Array  # final regularization carry
    # traces: [max_dual_updates, max_iterations]; valid where trace_mask
    trace_cost: jax.Array
    trace_gradient_norm: jax.Array
    trace_violation: jax.Array
    trace_step_size: jax.Array
    trace_mask: jax.Array
    # the constraint tolerance the solve ran with, carried so `converged`
    # reflects the actual options (reference: src/options.jl:8) rather than a
    # hardcoded default
    tol_constraint: jax.Array

    @property
    def converged(self):
        return self.max_violation <= self.tol_constraint


class _InnerCarry(NamedTuple):
    xs: jax.Array
    us: jax.Array
    J: jax.Array
    c: jax.Array
    K: jax.Array
    k: jax.Array
    reg: jax.Array
    grad_norm: jax.Array
    status: jax.Array
    stop: jax.Array
    it: jax.Array
    viol: jax.Array
    step_size: jax.Array
    tr_cost: jax.Array
    tr_grad: jax.Array
    tr_viol: jax.Array
    tr_step: jax.Array
    tr_mask: jax.Array


class _OuterCarry(NamedTuple):
    xs: jax.Array
    us: jax.Array
    ws: jax.Array
    duals: jax.Array
    penalty: jax.Array
    reg: jax.Array
    al_it: jax.Array
    stop: jax.Array
    total_iters: jax.Array
    J: jax.Array
    grad_norm: jax.Array
    viol: jax.Array
    viol_prev: jax.Array
    status: jax.Array
    step_size: jax.Array
    K: jax.Array
    k: jax.Array
    trace_cost: jax.Array
    trace_grad: jax.Array
    trace_viol: jax.Array
    trace_step: jax.Array
    trace_mask: jax.Array


@dataclasses.dataclass
class CallbackState:
    """State handed to the user AL callback (reference hook:
    src/solve.jl:124-125, intended for continuation/homotopy schemes).
    The callback must be a pure, jittable (CallbackState) -> CallbackState."""

    xs: jax.Array
    us: jax.Array
    ws: jax.Array
    duals: jax.Array
    penalty: jax.Array
    al_iteration: jax.Array


def make_solve_fn(
    spec: ProblemSpec,
    options: Options = Options(),
    callback: Optional[Callable[[CallbackState], CallbackState]] = None,
    dual_warm_start: bool = False,
):
    """Build the pure solve function ``(xs_init, us_init, ws) -> Solution``.

    ``ws`` is the [T, npar] per-timestep parameter trajectory; duals/penalties
    are reset at entry (reference: src/solve.jl:95-103).  With
    ``dual_warm_start=True`` the signature becomes
    ``(xs_init, us_init, ws, duals0, penalty0) -> Solution`` so MPC loops can
    carry multipliers across re-solves (a capability the reference's
    reset-on-entry precludes).
    """
    nc = spec.nc
    x_mask = jnp.asarray(spec.x_mask)
    u_mask = jnp.asarray(spec.u_mask)
    c_mask = jnp.asarray(spec.c_mask)
    ineq = jnp.asarray(spec.ineq_mask)
    armijo = options.line_search == "armijo"

    def al_objective(xs, us, ws, duals, penalty):
        J = dv.total_cost(spec, xs, us, ws)
        c = dv.constraint_values(spec, xs, us, ws)
        if nc > 0:
            J = J + al_ops.al_terms(c, duals, penalty, ineq)
        return J, c

    def derive(xs, us, ws, duals, penalty, c, reg):
        """Derivative stacks + AL augmentation + backward pass.

        Kept as separate vmapped stacks: the fused single-pass variant
        (dv.stage_derivatives) is faster in isolation (2.26 vs 2.81ms at
        B=4096) but regresses the full solve ~30% (measured 5484 vs 7804
        solves/s/chip) — same layout-interaction lesson as the v2 pallas
        kernel (ops/pallas_backward.py docstring).
        """
        fx, fu = dv.dynamics_jacobians(spec, xs, us, ws)
        gx, gu = dv.cost_gradients(spec, xs, us, ws)
        gxx, guu, gux = dv.cost_hessians(spec, xs, us, ws)
        if nc > 0:
            cx, cu = dv.constraint_jacobians(spec, xs, us, ws)
            dgx, dgu, dgxx, dguu, dgux = al_ops.al_gradient_terms(
                c, cx, cu, duals, penalty, ineq
            )
            gx, gu = gx + dgx, gu + dgu
            gxx, guu, gux = gxx + dgxx, guu + dguu, gux + dgux
        K, k, Qx, Qu, p, _ok, reg_next = backward_pass(
            fx, fu, gx, gu, gxx, guu, gux, u_mask, reg, options
        )
        # Lagrangian gradient inf-norm over valid dims
        # (reference: src/solve.jl:67-83 + norm at :35)
        lx = jnp.abs(Qx - p) * x_mask[:-1]
        lu = jnp.abs(Qu) * u_mask
        grad_norm = jnp.maximum(jnp.max(lx), jnp.max(lu))
        return fx, fu, K, k, Qx, Qu, p, grad_norm, reg_next

    def viol_of(c):
        return al_ops.max_violation(c, ineq, c_mask)

    def ilqr(xs, us, ws, duals, penalty, reg):
        """Inner iLQR loop, restructured for single-trace bodies.

        The reference order is {derive+backward before the loop; loop: forward,
        derive+backward, check} (src/solve.jl:9-51).  Tracing `derive` twice
        (entry + body) dominates jit lowering time, so here the body is
        {derive+backward at the current nominal; gradient-tolerance check;
        forward line search} with the line-search result discarded when the
        gradient test already fired — the same sequence of accepted nominals
        and the same stopping criteria, traced once.
        """
        dtype = xs.dtype
        obj_fn = lambda xs_, us_: al_objective(xs_, us_, ws, duals, penalty)
        J0, c0 = obj_fn(xs, us)
        n_tr = options.max_iterations if options.record_traces else 1
        zrow = jnp.zeros((n_tr,), dtype)
        carry = _InnerCarry(
            xs=xs, us=us, J=J0, c=c0,
            K=jnp.zeros((spec.T - 1, spec.nu, spec.nx), dtype),
            k=jnp.zeros((spec.T - 1, spec.nu), dtype),
            reg=reg, grad_norm=jnp.asarray(jnp.inf, dtype),
            status=jnp.asarray(True), stop=jnp.asarray(False),
            it=jnp.asarray(0), viol=viol_of(c0),
            step_size=jnp.ones((), dtype),
            tr_cost=zrow, tr_grad=zrow, tr_viol=zrow, tr_step=zrow,
            tr_mask=jnp.zeros((n_tr,), bool),
        )

        def cond(s: _InnerCarry):
            return (~s.stop) & (s.it < options.max_iterations)

        def body(s: _InnerCarry):
            fx, fu, K, k, Qx, Qu, p, grad_norm, reg = derive(
                s.xs, s.us, ws, duals, penalty, s.c, s.reg
            )
            # gradient stop at the current nominal
            # (reference: src/solve.jl:48, checked there post-forward at the
            # same point; also fires at the warm-started initial nominal)
            stop_grad = grad_norm < options.lagrangian_gradient_tolerance

            if armijo:
                zx, zu = trajectory_sensitivities(
                    fx, fu, K, k, unroll=options.scan_unroll
                )
                slope = armijo_slope(Qx, Qu, p, zx, zu)
            else:
                slope = jnp.zeros((), dtype)
            xs_n, us_n, J_n, c_n, status, step = line_search(
                spec, obj_fn, s.xs, s.us, ws, K, k, slope, s.J, s.c, options,
                duals=duals, penalty=penalty,
            )
            # barrier: an XLA CPU while-loop miscompilation was observed to
            # deliver a stale `c` carry (one iteration behind xs/J — verified
            # impossible in the program semantics and absent under
            # disable_jit); the barrier pins these values together before the
            # carry update.  Solution.max_violation is additionally recomputed
            # from the final trajectory at exit.
            xs_n, us_n, J_n, c_n = jax.lax.optimization_barrier(
                (xs_n, us_n, J_n, c_n)
            )
            # discard the step if the gradient test already converged
            keep = ~stop_grad
            xs_n = jnp.where(keep, xs_n, s.xs)
            us_n = jnp.where(keep, us_n, s.us)
            J_n = jnp.where(keep, J_n, s.J)
            c_n = jnp.where(keep, c_n, s.c)
            status = jnp.where(keep, status, s.status)
            step = jnp.where(keep, step, s.step_size)

            it = s.it + 1
            viol = viol_of(c_n)
            # convergence (reference: src/solve.jl:48-50).  A Tassa-style
            # "escalate reg and keep iterating on line-search trouble" inner
            # loop was tried and measured WORSE (the escalated reg poisons
            # subsequent AL rounds and wedges acrobot); the spurious
            # floor-step |dJ| exits after dual updates are instead handled by
            # the outer loop's stall-gated penalty growth (adaptive_penalty).
            stop = (
                stop_grad
                | (jnp.abs(J_n - s.J) < options.objective_tolerance)
                | (~status)
            )
            return _InnerCarry(
                xs=xs_n, us=us_n, J=J_n, c=c_n, K=K, k=k,
                reg=reg, grad_norm=grad_norm, status=status, stop=stop,
                it=it, viol=viol, step_size=step,
                tr_cost=s.tr_cost.at[s.it].set(J_n) if options.record_traces else s.tr_cost,
                tr_grad=s.tr_grad.at[s.it].set(grad_norm) if options.record_traces else s.tr_grad,
                tr_viol=s.tr_viol.at[s.it].set(viol) if options.record_traces else s.tr_viol,
                tr_step=s.tr_step.at[s.it].set(step) if options.record_traces else s.tr_step,
                tr_mask=s.tr_mask.at[s.it].set(True) if options.record_traces else s.tr_mask,
            )

        return jax.lax.while_loop(cond, body, carry)

    def solve(xs_init, us_init, ws) -> Solution:
        # TPU MXU matmuls default to bfloat16 multiply-accumulate, which
        # destroys Riccati-recursion conditioning (observed: 62% solved /
        # 2.7x iterations on TPU vs 100% on CPU at identical f32).  The
        # matrices here are tiny (VPU-bound), so full-f32 precision is free.
        with jax.default_matmul_precision("float32"):
            return _solve(xs_init, us_init, ws, None, None)

    def solve_warm(xs_init, us_init, ws, duals0, penalty0) -> Solution:
        with jax.default_matmul_precision("float32"):
            return _solve(xs_init, us_init, ws, duals0, penalty0)

    def _solve(xs_init, us_init, ws, duals0, penalty0) -> Solution:
        dtype = xs_init.dtype
        T = spec.T
        if duals0 is None:
            duals0 = jnp.zeros((T, nc), dtype)
        if penalty0 is None:
            penalty0 = jnp.full((T, nc), options.initial_constraint_penalty, dtype)
        n_tr = options.max_iterations if options.record_traces else 1
        n_al = options.max_dual_updates if options.record_traces else 1
        zt = jnp.zeros((n_al, n_tr), dtype)
        carry = _OuterCarry(
            xs=xs_init, us=us_init, ws=ws,
            duals=duals0, penalty=penalty0,
            reg=jnp.asarray(options.regularization_initial, dtype),
            al_it=jnp.asarray(0), stop=jnp.asarray(False),
            total_iters=jnp.asarray(0),
            J=jnp.zeros((), dtype), grad_norm=jnp.zeros((), dtype),
            viol=jnp.zeros((), dtype),
            viol_prev=jnp.asarray(jnp.inf, dtype),
            status=jnp.asarray(True),
            step_size=jnp.ones((), dtype),
            K=jnp.zeros((T - 1, spec.nu, spec.nx), dtype),
            k=jnp.zeros((T - 1, spec.nu), dtype),
            trace_cost=zt, trace_grad=zt, trace_viol=zt, trace_step=zt,
            trace_mask=jnp.zeros(zt.shape, bool),
        )

        def cond(s: _OuterCarry):
            return (~s.stop) & (s.al_it < options.max_dual_updates)

        def body(s: _OuterCarry):
            inner = ilqr(s.xs, s.us, s.ws, s.duals, s.penalty, s.reg)
            # break *before* the dual update when already feasible
            # (reference: src/solve.jl:113-121).  The violation and the dual
            # ascent both use constraints evaluated FRESH at the inner
            # solution (one cheap stack per AL round): the carried c inside
            # the inner while-loop was observed to arrive one iteration stale
            # under an XLA CPU miscompilation (see the barrier note in the
            # inner body), and stop/dual decisions must never ride on it.
            c_fresh = dv.constraint_values(spec, inner.xs, inner.us, s.ws)
            viol_fresh = viol_of(c_fresh)
            stop = viol_fresh <= options.constraint_tolerance
            if nc > 0:
                if options.adaptive_penalty:
                    # stall-gated growth: when this AL round failed to cut the
                    # violation by penalty_stall_gate, the current penalty is
                    # too weak to restructure the trajectory — jump it by an
                    # extra scaling_penalty_stalled instead of crawling up one
                    # decade per round (measured: reaches the working range in
                    # 1-2 rounds instead of 5+ on acrobot at parity defaults)
                    stalled = viol_fresh > options.penalty_stall_gate * s.viol_prev
                    scale_eff = jnp.where(
                        stalled,
                        options.scaling_penalty * options.scaling_penalty_stalled,
                        options.scaling_penalty,
                    )
                else:
                    scale_eff = options.scaling_penalty
                new_duals, new_penalty = al_ops.dual_update(
                    c_fresh, s.duals, s.penalty, ineq,
                    scale_eff, options.max_penalty,
                )
                duals = jnp.where(stop, s.duals, new_duals)
                penalty = jnp.where(stop, s.penalty, new_penalty)
            else:
                duals, penalty = s.duals, s.penalty
                stop = jnp.asarray(True)
            if options.live_progress:
                from ..utils.printing import live_progress_line

                jax.debug.callback(
                    live_progress_line,
                    s.al_it, inner.it, inner.J, inner.grad_norm, viol_fresh,
                    ordered=False,
                )
            ws_next = s.ws
            xs_next, us_next = inner.xs, inner.us
            if callback is not None:
                cb = callback(
                    CallbackState(
                        xs=inner.xs, us=inner.us, ws=s.ws,
                        duals=duals, penalty=penalty,
                        al_iteration=s.al_it,
                    )
                )
                # apply only while the outer loop continues
                xs_next = jnp.where(stop, xs_next, cb.xs)
                us_next = jnp.where(stop, us_next, cb.us)
                ws_next = jnp.where(stop, s.ws, cb.ws)
                duals = jnp.where(stop, duals, cb.duals)
                penalty = jnp.where(stop, penalty, cb.penalty)
            return _OuterCarry(
                xs=xs_next, us=us_next, ws=ws_next,
                duals=duals, penalty=penalty, reg=inner.reg,
                al_it=s.al_it + 1, stop=stop,
                total_iters=s.total_iters + inner.it,
                J=inner.J, grad_norm=inner.grad_norm, viol=viol_fresh,
                viol_prev=viol_fresh,
                status=inner.status, step_size=inner.step_size,
                K=inner.K, k=inner.k,
                trace_cost=s.trace_cost.at[s.al_it].set(inner.tr_cost) if options.record_traces else s.trace_cost,
                trace_grad=s.trace_grad.at[s.al_it].set(inner.tr_grad) if options.record_traces else s.trace_grad,
                trace_viol=s.trace_viol.at[s.al_it].set(inner.tr_viol) if options.record_traces else s.trace_viol,
                trace_step=s.trace_step.at[s.al_it].set(inner.tr_step) if options.record_traces else s.trace_step,
                trace_mask=s.trace_mask.at[s.al_it].set(inner.tr_mask) if options.record_traces else s.trace_mask,
            )

        s = jax.lax.while_loop(cond, body, carry)
        # report the violation of the trajectory actually returned, evaluated
        # fresh — the carried value tracks the loop's view and must never be
        # the user-facing number
        c_final = dv.constraint_values(spec, s.xs, s.us, s.ws)
        viol_final = viol_of(c_final)
        # Re-derive gains/gradient about the RETURNED trajectory: inside the
        # loop K/k/grad_norm are computed at the pre-step nominal, so on
        # objective-tolerance or max-iteration exits they lag the accepted
        # trajectory by one step.  The reference re-derives after every
        # forward pass (src/solve.jl:28-32) and so always reports matching
        # gains; one extra derive per solve (~1% of a batched solve) restores
        # that invariant.
        _, _, K_f, k_f, _, _, _, grad_f, _ = derive(
            s.xs, s.us, s.ws, s.duals, s.penalty, c_final, s.reg
        )
        return Solution(
            xs=s.xs, us=s.us, K=K_f, k=k_f,
            objective=s.J, gradient_norm=grad_f,
            max_violation=viol_final, status=s.status,
            iterations=s.total_iters, al_iterations=s.al_it,
            step_size=s.step_size, duals=s.duals, penalty=s.penalty,
            reg=s.reg,
            trace_cost=s.trace_cost, trace_gradient_norm=s.trace_grad,
            trace_violation=s.trace_viol, trace_step_size=s.trace_step,
            trace_mask=s.trace_mask,
            tol_constraint=jnp.asarray(options.constraint_tolerance, dtype),
        )

    return solve_warm if dual_warm_start else solve
