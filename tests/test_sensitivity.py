"""Parameter-sensitivity (dJ*/dw) vs. finite differences of the full solve.

The envelope/adjoint gradient must match central finite differences of the
re-solved optimal value to the accuracy permitted by solver tolerances
(reference parity note: this is the feature the reference left as "coming
soon", README.md:28).
"""

import jax
import jax.numpy as jnp
import numpy as np

from iterativelqr_tpu import Constraint, Cost, Dynamics, Options
from iterativelqr_tpu.core.solve import make_solve_fn
from iterativelqr_tpu.core.spec import build_spec
from iterativelqr_tpu.ops import derivatives as dv
from iterativelqr_tpu.ops.sensitivity import parameter_gradient


def _setup(T=9):
    """Particle tracking problem: stage cost 0.1*||x - w||^2 + 0.1 u^2 with a
    2-vector parameter w per timestep; terminal equality to the origin."""
    A = jnp.array([[1.0, 0.2], [0.0, 1.0]])
    B = jnp.array([0.0, 0.2])

    dyn = Dynamics(lambda x, u, w: A @ x + B * u[0], 2, 1, num_parameter=2)
    stage = Cost(
        lambda x, u, w: 0.1 * jnp.sum((x - w) ** 2) + 0.1 * jnp.sum(u**2),
        2, 1, num_parameter=2,
    )
    term = Cost(lambda x, u, w: 0.1 * jnp.sum((x - w) ** 2), 2, 0, num_parameter=2)
    goal = Constraint(lambda x, u, w: x - w, 2, 0, num_parameter=2)
    dynamics = [dyn] * (T - 1)
    objective = [stage] * (T - 1) + [term]
    constraints = [Constraint() for _ in range(T - 1)] + [goal]
    spec = build_spec(dynamics, objective, constraints)
    return spec


def test_parameter_gradient_matches_fd():
    T = 9
    spec = _setup(T)
    # tight tolerances so the envelope identity holds well at the solution
    opts = Options(
        verbose=False,
        objective_tolerance=1e-10,
        lagrangian_gradient_tolerance=1e-10,
        constraint_tolerance=1e-8,
        max_dual_updates=14,
    )
    solve = jax.jit(make_solve_fn(spec, opts))

    key = jax.random.PRNGKey(3)
    ws = 0.3 * jax.random.normal(key, (T, spec.npar), jnp.float64)
    xs0 = jnp.zeros((T, spec.nx), jnp.float64).at[0].set(jnp.array([0.5, -0.2]))
    us0 = jnp.zeros((T - 1, spec.nu), jnp.float64)

    sol = solve(xs0, us0, ws)
    assert float(sol.max_violation) <= 1e-8

    g = parameter_gradient(spec, opts, sol.xs, sol.us, ws, sol.duals, sol.penalty)
    assert g.shape == (T, spec.npar)

    def value(ws_):
        s = solve(xs0, us0, ws_)
        # true objective at the solution (AL terms vanish as c -> 0)
        return float(dv.total_cost(spec, s.xs, s.us, ws_))

    eps = 1e-5
    rng = np.random.default_rng(0)
    for _ in range(6):
        t = int(rng.integers(0, T))
        j = int(rng.integers(0, spec.npar))
        e = jnp.zeros_like(ws).at[t, j].set(eps)
        fd = (value(ws + e) - value(ws - e)) / (2 * eps)
        assert np.isclose(float(g[t, j]), fd, rtol=2e-3, atol=2e-5), (
            f"t={t} j={j}: adjoint {float(g[t, j]):.8f} vs fd {fd:.8f}"
        )


def test_parameter_gradient_batched():
    """vmap composes: per-instance gradients for a batch of parameter trajs."""
    T = 7
    spec = _setup(T)
    opts = Options(verbose=False)
    solve = jax.vmap(make_solve_fn(spec, opts), in_axes=(0, 0, 0))

    B = 4
    key = jax.random.PRNGKey(0)
    ws = 0.2 * jax.random.normal(key, (B, T, spec.npar), jnp.float64)
    xs0 = jnp.zeros((B, T, spec.nx), jnp.float64)
    us0 = jnp.zeros((B, T - 1, spec.nu), jnp.float64)
    sol = jax.jit(solve)(xs0, us0, ws)

    grad_fn = jax.vmap(
        lambda xs, us, w, d, pen: parameter_gradient(spec, opts, xs, us, w, d, pen)
    )
    g = jax.jit(grad_fn)(sol.xs, sol.us, ws, sol.duals, sol.penalty)
    assert g.shape == (B, T, spec.npar)
    assert bool(jnp.all(jnp.isfinite(g)))
    # distinct parameter trajectories -> distinct gradients
    assert float(jnp.std(g[:, 0, 0])) > 1e-8
