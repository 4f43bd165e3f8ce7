"""Associative-scan Riccati vs. the sequential reverse scan.

The parallel-prefix backward pass must agree with the sequential recursion
(which itself mirrors reference src/backward_pass.jl:42-90) to float64
round-off on well-conditioned problems, and the full solve must reach the same
solution on the acrobot swing-up.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterativelqr_tpu import Options, Solver
from iterativelqr_tpu.models import acrobot
from iterativelqr_tpu.ops.assoc import backward_pass_associative
from iterativelqr_tpu.ops.backward import backward_pass_scan


def _random_lq(key, T, nx, nu, dtype=jnp.float64):
    ks = jax.random.split(key, 7)
    fx = 0.3 * jax.random.normal(ks[0], (T - 1, nx, nx), dtype) + jnp.eye(nx, dtype=dtype)
    fu = jax.random.normal(ks[1], (T - 1, nx, nu), dtype)
    gx = jax.random.normal(ks[2], (T, nx), dtype)
    gu = jax.random.normal(ks[3], (T - 1, nu), dtype)

    def spd(k, rows, d, scale=1.0):
        A = jax.random.normal(k, (rows, d, d), dtype)
        return scale * (A @ jnp.swapaxes(A, -1, -2)) + 2.0 * jnp.eye(d, dtype=dtype)

    gxx = spd(ks[4], T, nx, 0.5)
    guu = spd(ks[5], T - 1, nu)
    gux = 0.3 * jax.random.normal(ks[6], (T - 1, nu, nx), dtype)
    return fx, fu, gx, gu, gxx, guu, gux


@pytest.mark.parametrize("nx,nu", [(4, 1), (3, 2), (6, 3)])
def test_assoc_matches_scan(nx, nu):
    T = 17
    fx, fu, gx, gu, gxx, guu, gux = _random_lq(jax.random.PRNGKey(0), T, nx, nu)
    u_mask = jnp.ones((T - 1, nu), bool)
    reg = jnp.zeros((), jnp.float64)

    out_s = backward_pass_scan(fx, fu, gx, gu, gxx, guu, gux, u_mask, reg)
    out_a = backward_pass_associative(fx, fu, gx, gu, gxx, guu, gux, u_mask, reg)

    names = ["K", "k", "Qx", "Qu", "p"]
    for name, a, b in zip(names, out_s[:5], out_a[:5]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-8, err_msg=name
        )
    assert bool(out_s[5]) and bool(out_a[5])


def test_assoc_matches_scan_padded():
    """Padded action dims must produce identical (zero) gain rows in both paths."""
    T, nx, nu = 9, 4, 3
    fx, fu, gx, gu, gxx, guu, gux = _random_lq(jax.random.PRNGKey(1), T, nx, nu)
    # mark the last action dim invalid everywhere; zero its jacobian/cost rows
    # the way spec padding does
    u_mask = jnp.ones((T - 1, nu), bool).at[:, -1].set(False)
    fu = fu.at[:, :, -1].set(0.0)
    gu = gu.at[:, -1].set(0.0)
    guu = guu.at[:, -1, :].set(0.0).at[:, :, -1].set(0.0)
    gux = gux.at[:, -1, :].set(0.0)
    reg = jnp.zeros((), jnp.float64)

    out_s = backward_pass_scan(fx, fu, gx, gu, gxx, guu, gux, u_mask, reg)
    out_a = backward_pass_associative(fx, fu, gx, gu, gxx, guu, gux, u_mask, reg)
    np.testing.assert_allclose(np.asarray(out_s[0]), np.asarray(out_a[0]), atol=1e-8)
    assert np.all(np.asarray(out_a[0])[:, -1, :] == 0.0)
    assert np.all(np.asarray(out_a[1])[:, -1] == 0.0)


def test_assoc_full_solve_acrobot():
    """End-to-end: associative backward pass solves the swing-up like scan does."""
    T = 31
    dynamics, objective, constraints, x1, xT = acrobot.problem(T)
    opts = Options(verbose=False, backward_pass="associative")
    solver = Solver(dynamics, objective, constraints, options=opts)

    us = [0.05 * jnp.ones(1) for _ in range(T - 1)]
    from iterativelqr_tpu import rollout

    xs = rollout(dynamics, x1, us)
    solver.initialize_states(xs)
    solver.initialize_controls(us)
    sol = solver.solve()
    assert float(sol.max_violation) <= 5.0e-3


def test_backward_auto_dispatch():
    """backward_pass='auto': associative unbatched, scan under vmap."""
    from iterativelqr_tpu.ops.backward import backward_pass, backward_pass_scan
    from iterativelqr_tpu.ops.assoc import backward_pass_associative

    T, nx, nu, B = 9, 4, 2, 6
    fx, fu, gx, gu, gxx, guu, gux = _random_lq(jax.random.PRNGKey(4), T, nx, nu)
    u_mask = jnp.ones((T - 1, nu), bool)
    opts = Options(verbose=False, backward_pass="auto")
    reg0 = jnp.zeros(())

    # unbatched -> associative
    out_auto = backward_pass(fx, fu, gx, gu, gxx, guu, gux, u_mask, reg0, opts)
    out_assoc = backward_pass_associative(
        fx, fu, gx, gu, gxx, guu, gux, u_mask, reg0
    )
    np.testing.assert_allclose(
        np.asarray(out_auto[0]), np.asarray(out_assoc[0]), rtol=1e-10, atol=1e-12
    )

    # batched -> scan
    batch = lambda a: jnp.broadcast_to(a, (B,) + a.shape) * jnp.linspace(
        0.9, 1.1, B
    ).reshape((B,) + (1,) * a.ndim)
    bfx, bfu, bgx, bgu, bgxx, bguu, bgux = map(
        batch, (fx, fu, gx, gu, gxx, guu, gux)
    )
    out_b = jax.vmap(
        lambda *a: backward_pass(*a, u_mask, reg0, opts)
    )(bfx, bfu, bgx, bgu, bgxx, bguu, bgux)
    ref_b = jax.vmap(
        lambda *a: backward_pass_scan(*a, u_mask, reg0)
    )(bfx, bfu, bgx, bgu, bgxx, bguu, bgux)
    np.testing.assert_allclose(
        np.asarray(out_b[0]), np.asarray(ref_b[0]), rtol=1e-9, atol=1e-10
    )


def test_backward_auto_dispatch_regime_rule():
    """The auto rule is (B, T)-driven (docs/design.md section 3 regime
    table): under vmap, small batches with long horizons route to the
    associative scan, chip-filling batches to the sequential scan."""
    from iterativelqr_tpu.ops.backward import _assoc_wins, backward_pass
    from iterativelqr_tpu.ops.assoc import backward_pass_associative

    assert _assoc_wins(1, 101) and _assoc_wins(64, 501)
    assert not _assoc_wins(64, 251) and not _assoc_wins(512, 101)
    assert not _assoc_wins(4096, 501)

    # exercise the vmapped assoc branch numerically: B=2, T=51 -> assoc
    T, nx, nu, B = 51, 4, 2, 2
    fx, fu, gx, gu, gxx, guu, gux = _random_lq(jax.random.PRNGKey(7), T, nx, nu)
    u_mask = jnp.ones((T - 1, nu), bool)
    opts = Options(verbose=False, backward_pass="auto")
    reg0 = jnp.zeros(())
    batch = lambda a: jnp.stack([a, a * 1.05])
    args = tuple(map(batch, (fx, fu, gx, gu, gxx, guu, gux)))
    out_b = jax.vmap(lambda *a: backward_pass(*a, u_mask, reg0, opts))(*args)
    ref_b = jax.vmap(
        lambda *a: backward_pass_associative(*a, u_mask, reg0)
    )(*args)
    np.testing.assert_allclose(
        np.asarray(out_b[0]), np.asarray(ref_b[0]), rtol=1e-8, atol=1e-10
    )
