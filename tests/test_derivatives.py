"""Derivative-stack correctness vs. independent numerical differentiation.

Mirrors the reference test strategy (reference: test/objective.jl:22-40,
test/dynamics.jl:31-50, test/constraints.jl:25-43): each autodiff path is
checked against finite differences and, where available, hand-derived closed
forms.
"""

import jax
import jax.numpy as jnp
import numpy as np

import iterativelqr_tpu as ilqr
from iterativelqr_tpu.core.spec import build_spec
from iterativelqr_tpu.models.pendulum import pendulum_discrete
from iterativelqr_tpu.ops import derivatives as dv


def _fd_jacobian(f, x, eps=1e-6):
    x = np.asarray(x, dtype=float)
    y0 = np.asarray(f(x))
    J = np.zeros((y0.size, x.size))
    for i in range(x.size):
        xp = x.copy()
        xp[i] += eps
        xm = x.copy()
        xm[i] -= eps
        J[:, i] = (np.asarray(f(xp)) - np.asarray(f(xm))).ravel() / (2 * eps)
    return J


def _problem(T=5):
    n, m = 2, 1
    dyn = ilqr.Dynamics(pendulum_discrete, n, m)
    stage = ilqr.Cost(
        lambda x, u: jnp.dot(x, x) + 0.1 * jnp.dot(u, u), n, m
    )
    term = ilqr.Cost(lambda x, u: 10.0 * jnp.dot(x, x), n, 0)
    con = ilqr.Constraint(
        lambda x, u: jnp.concatenate([u - 1.0, x[:1] - 0.5]),
        n,
        m,
        indices_inequality=[0],
    )
    tcon = ilqr.Constraint(lambda x, u: x - 1.0, n, 0)
    spec = build_spec(
        [dyn] * (T - 1), [stage] * (T - 1) + [term], [con] * (T - 1) + [tcon]
    )
    rng = np.random.default_rng(42)
    xs = jnp.asarray(rng.standard_normal((T, n)))
    us = jnp.asarray(rng.standard_normal((T - 1, m)))
    ws = jnp.zeros((T, 0))
    return spec, xs, us, ws


def test_cost_values_and_gradients():
    spec, xs, us, ws = _problem()
    J = dv.total_cost(spec, xs, us, ws)
    # closed form
    J_ref = sum(
        float(jnp.dot(xs[t], xs[t]) + 0.1 * jnp.dot(us[t], us[t]))
        for t in range(4)
    ) + 10.0 * float(jnp.dot(xs[4], xs[4]))
    np.testing.assert_allclose(float(J), J_ref, rtol=1e-12)

    gx, gu = dv.cost_gradients(spec, xs, us, ws)
    np.testing.assert_allclose(np.asarray(gx[:4]), 2.0 * np.asarray(xs[:4]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gx[4]), 20.0 * np.asarray(xs[4]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gu), 0.2 * np.asarray(us), rtol=1e-12)

    gxx, guu, gux = dv.cost_hessians(spec, xs, us, ws)
    for t in range(4):
        np.testing.assert_allclose(np.asarray(gxx[t]), 2.0 * np.eye(2), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(guu[t]), 0.2 * np.eye(1), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(gux[t]), np.zeros((1, 2)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(gxx[4]), 20.0 * np.eye(2), rtol=1e-12)


def test_dynamics_jacobians_vs_finite_difference():
    spec, xs, us, ws = _problem()
    fx, fu = dv.dynamics_jacobians(spec, xs, us, ws)
    for t in range(4):
        x, u = np.asarray(xs[t]), np.asarray(us[t])
        Jx = _fd_jacobian(lambda z: pendulum_discrete(jnp.asarray(z), jnp.asarray(u)), x)
        Ju = _fd_jacobian(lambda z: pendulum_discrete(jnp.asarray(x), jnp.asarray(z)), u)
        np.testing.assert_allclose(np.asarray(fx[t]), Jx, atol=1e-6)
        np.testing.assert_allclose(np.asarray(fu[t]), Ju, atol=1e-6)


def test_constraint_values_and_jacobians():
    spec, xs, us, ws = _problem()
    c = dv.constraint_values(spec, xs, us, ws)
    cx, cu = dv.constraint_jacobians(spec, xs, us, ws)
    # stage rows: [u - 1, x0 - 0.5]; terminal rows: x - 1
    for t in range(4):
        np.testing.assert_allclose(
            np.asarray(c[t]), [float(us[t, 0]) - 1.0, float(xs[t, 0]) - 0.5]
        )
        np.testing.assert_allclose(np.asarray(cx[t]), [[0.0, 0.0], [1.0, 0.0]])
        np.testing.assert_allclose(np.asarray(cu[t]), [[1.0], [0.0]])
    np.testing.assert_allclose(np.asarray(c[4]), np.asarray(xs[4]) - 1.0)
    np.testing.assert_allclose(np.asarray(cx[4]), np.eye(2))


def test_manual_derivatives_match_autodiff():
    """Manual-derivative escape hatch (reference: src/dynamics.jl:55-60)."""
    n, m = 2, 1

    def f(x, u):
        return jnp.array([x[0] + 0.1 * x[1], x[1] + 0.1 * u[0]])

    auto = ilqr.Dynamics(f, n, m)
    manual = ilqr.Dynamics(
        f,
        n,
        m,
        num_next_state=2,
        jacobian_state=lambda x, u: jnp.array([[1.0, 0.1], [0.0, 1.0]]),
        jacobian_action=lambda x, u: jnp.array([[0.0], [0.1]]),
    )
    for d in (auto, manual):
        spec = build_spec(
            [d] * 3,
            [ilqr.Cost(lambda x, u: jnp.dot(x, x), n, m)] * 3
            + [ilqr.Cost(lambda x, u: jnp.dot(x, x), n, 0)],
        )
        xs = jnp.ones((4, n))
        us = jnp.ones((3, m))
        fx, fu = dv.dynamics_jacobians(spec, xs, us, jnp.zeros((4, 0)))
        np.testing.assert_allclose(
            np.asarray(fx), np.broadcast_to([[1.0, 0.1], [0.0, 1.0]], (3, 2, 2))
        )
        np.testing.assert_allclose(
            np.asarray(fu), np.broadcast_to([[0.0], [0.1]], (3, 2, 1))
        )


def test_stage_derivatives_matches_separate_stacks():
    """The fused single-pass derive must equal the separate stacks, including
    on problems with multiple (dynamics, cost) stage types along the horizon."""
    import numpy as np
    from iterativelqr_tpu.ops import derivatives as dv

    T = 9
    A = jnp.array([[1.0, 0.3], [0.0, 1.0]])
    d1 = ilqr.Dynamics(lambda x, u: A @ x + jnp.array([0.0, 0.3]) * u[0], 2, 1)
    d2 = ilqr.Dynamics(lambda x, u: A @ x + jnp.array([0.1, 0.5]) * jnp.tanh(u[0]), 2, 1)
    g1 = ilqr.Cost(lambda x, u: 0.1 * (x @ x + u @ u), 2, 1)
    g2 = ilqr.Cost(lambda x, u: 0.3 * jnp.sum(jnp.cosh(x)) + 0.2 * u @ u, 2, 1)
    gT = ilqr.Cost(lambda x, u: 0.5 * (x @ x), 2, 0)
    dynamics = [d1 if t % 2 == 0 else d2 for t in range(T - 1)]
    costs = [g1 if t % 3 == 0 else g2 for t in range(T - 1)] + [gT]
    spec = ilqr.build_spec(dynamics, costs)

    key = jax.random.PRNGKey(0)
    xs = jax.random.normal(key, (T, 2))
    us = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (T - 1, 1))
    ws = jnp.zeros((T, 0))

    fused = dv.stage_derivatives(spec, xs, us, ws)
    fx, fu = dv.dynamics_jacobians(spec, xs, us, ws)
    gx, gu = dv.cost_gradients(spec, xs, us, ws)
    gxx, guu, gux = dv.cost_hessians(spec, xs, us, ws)
    for name, a, b in zip(
        ["fx", "fu", "gx", "gu", "gxx", "guu", "gux"],
        fused, (fx, fu, gx, gu, gxx, guu, gux),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-12, err_msg=name
        )
