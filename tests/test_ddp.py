"""Full DDP (second-order dynamics terms), Options.ddp.

The reference's backward pass is Gauss-Newton iLQR (reference:
src/backward_pass.jl:42-90 — Q** built from first-order dynamics terms
only); ``ddp=True`` adds the sum_i Vx_i * d2f_i curvature terms with
Tassa-style state regularization for the gains (ops/backward.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterativelqr_tpu import Options
from iterativelqr_tpu.core.solve import make_solve_fn
from iterativelqr_tpu.core.spec import build_spec
from iterativelqr_tpu.models import acrobot, particle
from iterativelqr_tpu.ops import derivatives as dv


def _problem(mod, T):
    dynamics, objective, constraints, x1, xT = mod.problem(T)
    spec = build_spec(dynamics, objective, constraints)
    xs = jnp.zeros((T, spec.nx)).at[0].set(x1)
    us = 0.05 * jnp.ones((T - 1, spec.nu))
    ws = jnp.zeros((T, max(spec.npar, 0)))
    return spec, xs, us, ws


def test_dynamics_hessians_match_finite_differences():
    """fxx/fuu/fux conventions (spec.hess_fn) against central differences on
    the acrobot dynamics."""
    spec, xs, us, ws = _problem(acrobot, 11)
    fxx, fuu, fux = dv.dynamics_hessians(spec, xs, us, ws)
    t = 3
    x = np.asarray(xs[t], dtype=np.float64)
    u = np.asarray(us[t], dtype=np.float64)
    w = np.asarray(ws[t], dtype=np.float64)
    f = spec.dyn_eval[int(spec.dyn_tidx[t])]
    eps = 1e-5

    def jac_x(x_, u_):
        J = np.zeros((spec.nx, spec.nx))
        for a in range(spec.nx):
            dx = np.zeros_like(x_)
            dx[a] = eps
            J[:, a] = (
                np.asarray(f(jnp.asarray(x_ + dx), jnp.asarray(u_), jnp.asarray(w)))
                - np.asarray(f(jnp.asarray(x_ - dx), jnp.asarray(u_), jnp.asarray(w)))
            ) / (2 * eps)
        return J

    # fxx[i, a, b] = d(fx[i, a])/dx_b
    for b in range(spec.nx):
        dx = np.zeros_like(x)
        dx[b] = eps
        d = (jac_x(x + dx, u) - jac_x(x - dx, u)) / (2 * eps)
        np.testing.assert_allclose(
            np.asarray(fxx[t, :, :, b]), d, rtol=2e-3, atol=2e-5
        )

    # fux[i, a, b] = d2 f_i / du_a dx_b
    for b in range(spec.nx):
        dx = np.zeros_like(x)
        dx[b] = eps
        du = np.zeros_like(u)
        du[0] = eps
        fpp = np.asarray(f(jnp.asarray(x + dx), jnp.asarray(u + du), jnp.asarray(w)))
        fpm = np.asarray(f(jnp.asarray(x + dx), jnp.asarray(u - du), jnp.asarray(w)))
        fmp = np.asarray(f(jnp.asarray(x - dx), jnp.asarray(u + du), jnp.asarray(w)))
        fmm = np.asarray(f(jnp.asarray(x - dx), jnp.asarray(u - du), jnp.asarray(w)))
        d = (fpp - fpm - fmp + fmm) / (4 * eps * eps)
        np.testing.assert_allclose(
            np.asarray(fux[t, :, 0, b]), d, rtol=2e-3, atol=2e-5
        )
    assert fuu.shape == (spec.T - 1, spec.nx, spec.nu, spec.nu)


def test_ddp_identical_to_gn_on_linear_dynamics():
    """Linear dynamics have zero second derivatives, so the DDP recursion
    must reproduce Gauss-Newton exactly (same iterates, same count)."""
    spec, xs, us, ws = _problem(particle, 11)
    sol_gn = jax.jit(make_solve_fn(spec, Options(verbose=False)))(xs, us, ws)
    sol_ddp = jax.jit(make_solve_fn(spec, Options(verbose=False, ddp=True)))(
        xs, us, ws
    )
    assert int(sol_gn.iterations) == int(sol_ddp.iterations)
    np.testing.assert_allclose(
        np.asarray(sol_gn.xs), np.asarray(sol_ddp.xs), rtol=1e-8, atol=1e-8
    )
    np.testing.assert_allclose(
        float(sol_gn.objective), float(sol_ddp.objective), rtol=1e-10
    )


def test_ddp_solves_acrobot_to_feasibility():
    """Nonlinear + constrained: DDP converges to full feasibility and (on
    this problem, measured) a better local optimum than Gauss-Newton."""
    spec, xs, us, ws = _problem(acrobot, 51)
    opts = Options(verbose=False, ddp=True)
    sol = jax.jit(make_solve_fn(spec, opts))(xs, us, ws)
    assert float(sol.max_violation) <= opts.constraint_tolerance
    sol_gn = jax.jit(make_solve_fn(spec, Options(verbose=False)))(xs, us, ws)
    assert float(sol.objective) <= float(sol_gn.objective) * 1.05


def test_ddp_batched_vmap_matches_single():
    """The vmap batch rule must reproduce per-instance DDP solves."""
    from iterativelqr_tpu.parallel import make_batched_solve_fn

    spec, xs, us, ws = _problem(particle, 11)
    B = 4
    key = jax.random.PRNGKey(0)
    x0 = xs[0] + 0.02 * jax.random.normal(key, (B, spec.nx), xs.dtype)
    xs_b = jnp.zeros((B,) + xs.shape, xs.dtype).at[:, 0, :].set(x0)
    us_b = jnp.broadcast_to(us, (B,) + us.shape)
    ws_b = jnp.broadcast_to(ws, (B,) + ws.shape)
    opts = Options(verbose=False, ddp=True, record_traces=False)
    sol_b = jax.jit(make_batched_solve_fn(spec, opts))(xs_b, us_b, ws_b)
    solve1 = jax.jit(make_solve_fn(spec, opts))
    for i in range(B):
        sol1 = solve1(xs_b[i], us_b[i], ws_b[i])
        np.testing.assert_allclose(
            np.asarray(sol_b.xs[i]), np.asarray(sol1.xs), rtol=1e-8, atol=1e-8
        )


def test_ddp_regularization_cures_null_fu_indefiniteness():
    """State regularization (reg * fuT fu) is singular along null(fu): a
    dynamics with a zero fu column and concave curvature there (Vx.fuu < 0)
    can only be cured by the diagonal share of the damping
    (ops/backward.py riccati_step DDP branch).  Without it the retry loop
    exhausts and the solve returns NaN gains."""
    from iterativelqr_tpu.core.spec import Cost, Dynamics

    T = 6
    # f = [x0 + u0, x1 - u1^2]: fu's second column is zero at u1 = 0 (the
    # line-search origin), and d2 f_1/du1^2 = -2, so with Vx_1 > 0 the DDP
    # term makes Quu[1,1] negative while reg*fuT fu cannot touch it.
    dyn = Dynamics(
        lambda x, u: jnp.array([x[0] + u[0], x[1] - u[1] ** 2]), 2, 2
    )
    # tiny control cost keeps guu ~ 0 so the curvature dominates; the state
    # cost drives Vx_1 positive along the backward pass
    stage = Cost(
        lambda x, u: x[1] + 0.5 * x[0] ** 2 + 1e-4 * (u @ u), 2, 2
    )
    term = Cost(lambda x, u: x[1] + 0.5 * x[0] ** 2, 2, 0)
    spec = build_spec([dyn] * (T - 1), [stage] * (T - 1) + [term], None)
    xs = jnp.zeros((T, spec.nx)).at[0, 0].set(1.0)
    us = jnp.zeros((T - 1, spec.nu))
    ws = jnp.zeros((T, 0))
    sol = jax.jit(make_solve_fn(spec, Options(verbose=False, ddp=True)))(
        xs, us, ws
    )
    assert bool(jnp.all(jnp.isfinite(sol.xs))), "NaN trajectory: PD retry failed"
    assert bool(jnp.all(jnp.isfinite(sol.K)))


def test_ddp_option_validation():
    with pytest.raises(ValueError):
        Options(ddp=True, backward_pass="associative")
    with pytest.raises(ValueError):
        Options(ddp=True, backward_pass="packed")
    with pytest.raises(ValueError):
        Options(ddp=True, batched_solver="sl")
    # scan and auto are fine
    Options(ddp=True, backward_pass="scan")
    Options(ddp=True)
