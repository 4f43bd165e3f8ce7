"""Batched (vmap) and mesh-sharded solves.

Exercises the parallel axes the reference lacks entirely (SURVEY.md
section 2.2): B independent constrained solves in one program, per-instance
convergence, and NamedSharding over a virtual 8-device CPU mesh with the
sharded result bitwise-comparable to the unsharded one (SURVEY.md section 4,
"multi-node testing" row).
"""

import jax
import jax.numpy as jnp
import numpy as np

from iterativelqr_tpu import Options
from iterativelqr_tpu.core.spec import build_spec
from iterativelqr_tpu.models import particle
from iterativelqr_tpu.parallel import (
    batch_stats,
    default_mesh,
    make_batched_solve_fn,
    make_sharded_solve_fn,
    shard_batch,
)


def _particle_spec(T=11):
    dynamics, objective, constraints, x1, xT = particle.problem(T)
    return build_spec(dynamics, objective, constraints), x1, xT


def _batch_inputs(spec, B, seed=0):
    key = jax.random.PRNGKey(seed)
    T, nx, nu, npar = spec.T, spec.nx, spec.nu, spec.npar
    x0 = jax.random.uniform(key, (B, nx), jnp.float64, -1.0, 1.0)
    xs = jnp.zeros((B, T, nx), jnp.float64).at[:, 0, :].set(x0)
    us = jnp.zeros((B, T - 1, nu), jnp.float64)
    ws = jnp.zeros((B, T, max(npar, 0)), jnp.float64)
    return xs, us, ws


def test_batched_particle_solves():
    spec, x1, xT = _particle_spec()
    B = 16
    xs, us, ws = _batch_inputs(spec, B)
    solve = jax.jit(make_batched_solve_fn(spec, Options(verbose=False)))
    sol = solve(xs, us, ws)
    assert sol.xs.shape == (B, spec.T, spec.nx)
    # every instance must reach the terminal goal from its own x0
    err = np.abs(np.asarray(sol.xs[:, -1, :]) - np.asarray(xT))
    assert err.max() <= 5.0e-3
    stats = batch_stats(sol)
    assert float(stats.solved_fraction) == 1.0
    # distinct initial conditions must produce distinct solutions
    assert np.std(np.asarray(sol.us[:, 0, 0])) > 1e-6


def test_sharded_matches_unsharded():
    spec, x1, xT = _particle_spec()
    mesh = default_mesh()
    B = 2 * len(jax.devices())
    xs, us, ws = _batch_inputs(spec, B, seed=1)

    plain = jax.jit(make_batched_solve_fn(spec, Options(verbose=False)))
    sol_plain = plain(xs, us, ws)

    sharded = make_sharded_solve_fn(spec, Options(verbose=False), mesh=mesh)
    xs_s, us_s, ws_s = shard_batch(mesh, "batch", xs, us, ws)
    sol_shard, stats = sharded(xs_s, us_s, ws_s)

    np.testing.assert_allclose(
        np.asarray(sol_plain.xs), np.asarray(sol_shard.xs), rtol=1e-10, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(sol_plain.us), np.asarray(sol_shard.us), rtol=1e-10, atol=1e-10
    )
    assert float(stats.solved_fraction) == 1.0
    assert float(stats.max_violation) <= 5.0e-3


def test_shared_parameters_in_axes():
    """One shared parameter trajectory across the batch (in_axes=None)."""
    spec, x1, xT = _particle_spec()
    B = 4
    xs, us, _ = _batch_inputs(spec, B, seed=2)
    ws = jnp.zeros((spec.T, max(spec.npar, 0)), jnp.float64)
    solve = jax.jit(
        make_batched_solve_fn(spec, Options(verbose=False), in_axes=(0, 0, None))
    )
    sol = solve(xs, us, ws)
    assert sol.xs.shape[0] == B
