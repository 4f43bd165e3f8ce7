"""Pallas line-search rollout kernels (ops/sl_forward_kernel.py) vs the
SL scan path.

The kernels replace the scoring scan and the winner re-roll inside
``SLOps.line_search`` with single pallas launches (chunked double-buffered
DMA).  Their per-step math must match the ``lax.scan`` path exactly: these
tests pin solver-level agreement (same iterate sequence) on constrained and
unconstrained models, plus the static eligibility rules.  On CPU the kernels
run in interpreter mode (``forward_kernel="pallas"`` + interpret=True).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterativelqr_tpu import Options
from iterativelqr_tpu.core.spec import Constraint, build_spec
from iterativelqr_tpu.models import acrobot, car, pendulum
from iterativelqr_tpu.ops import sl_forward_kernel as fk
from iterativelqr_tpu.ops.rollout import open_loop_rollout
from iterativelqr_tpu.parallel.batch import make_batched_solve_fn


def _batch(mod, T, B, u0, dtype=jnp.float32):
    dynamics, objective, constraints, x1, xT = mod.problem(T)
    spec = build_spec(dynamics, objective, constraints)
    key = jax.random.PRNGKey(7)
    x0 = jnp.zeros((B, spec.nx), dtype).at[:, : x1.shape[0]].set(
        x1.astype(dtype)
        + 0.02 * jax.random.normal(key, (B, x1.shape[0]), dtype)
    )
    us = jnp.full((B, T - 1, spec.nu), u0, dtype)
    ws = jnp.zeros((B, T, max(spec.npar, 0)), dtype)
    xs = jax.vmap(lambda x, u, w: open_loop_rollout(spec, x, u, w))(
        x0, us, ws
    )
    return spec, xs, us, ws


_BASE = dict(
    record_traces=False,
    backward_pass="packed",
    batched_solver="sl",
    max_iterations=12,
    max_dual_updates=3,
)


@pytest.mark.parametrize("mod,T,u0", [(acrobot, 9, 0.05), (car, 8, 0.01)])
def test_kernel_matches_scan_constrained(mod, T, u0):
    """Full SL solve, kernels vs scan: identical iterate sequence."""
    B = 4
    spec, xs, us, ws = _batch(mod, T, B, u0)
    assert fk.kernel_eligible(spec)
    scan_fn = make_batched_solve_fn(
        spec, Options(forward_kernel="scan", **_BASE), interpret=True
    )
    pal_fn = make_batched_solve_fn(
        spec, Options(forward_kernel="pallas", **_BASE), interpret=True
    )
    ref = scan_fn(xs, us, ws)
    out = pal_fn(xs, us, ws)
    for name in ("xs", "us", "objective", "max_violation", "duals"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)),
            np.asarray(getattr(ref, name)),
            rtol=1e-5, atol=1e-6, err_msg=name,
        )
    for name in ("iterations", "al_iterations", "status"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out, name)),
            np.asarray(getattr(ref, name)), err_msg=name,
        )


def test_kernel_matches_scan_unconstrained_nc0():
    """nc=0 (pure iLQR): the kernels' constraint-free code path."""
    T, B = 8, 3
    dynamics, objective, _, x1, xT = pendulum.problem(T)
    spec = build_spec(dynamics, objective, [Constraint() for _ in range(T)])
    assert spec.nc == 0 and fk.kernel_eligible(spec)
    key = jax.random.PRNGKey(5)
    x0 = jnp.zeros((B, spec.nx), jnp.float32).at[:, : x1.shape[0]].set(
        x1.astype(jnp.float32)
        + 0.3 * jax.random.normal(key, (B, x1.shape[0]), jnp.float32)
    )
    us = 0.5 * jax.random.normal(
        jax.random.PRNGKey(6), (B, T - 1, spec.nu), jnp.float32
    )
    ws = jnp.zeros((B, T, 0), jnp.float32)
    xs = jax.vmap(lambda x, u, w: open_loop_rollout(spec, x, u, w))(
        x0, us, ws
    )
    ref = make_batched_solve_fn(
        spec, Options(forward_kernel="scan", **_BASE), interpret=True
    )(xs, us, ws)
    out = make_batched_solve_fn(
        spec, Options(forward_kernel="pallas", **_BASE), interpret=True
    )(xs, us, ws)
    np.testing.assert_allclose(
        np.asarray(out.xs), np.asarray(ref.xs), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(out.iterations), np.asarray(ref.iterations)
    )


def test_score_and_reroll_unit():
    """Direct kernel-vs-scan comparison of one line-search call with random
    (non-converged) gains — exercises the per-step math away from the
    solver's accepted trajectory."""
    from iterativelqr_tpu.ops.sl_ops import SLOps, to_sl

    T, B, S = 9, 128, 1
    spec, xs, us, ws = _batch(acrobot, T, B, 0.05)
    key = jax.random.PRNGKey(11)
    K = 0.1 * jax.random.normal(key, (B, T - 1, spec.nu, spec.nx))
    k = 0.1 * jax.random.normal(
        jax.random.PRNGKey(12), (B, T - 1, spec.nu)
    )
    K, k, xs, us, ws = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32), (K, k, xs, us, ws)
    )

    o_scan = Options(forward_kernel="scan", **_BASE)
    o_pal = Options(forward_kernel="pallas", **_BASE)
    ops_scan = SLOps(spec, o_scan, interpret=True)
    ops_pal = SLOps(spec, o_pal, interpret=True)
    assert ops_pal._fk_score is not None

    xs_sl = to_sl(xs, S)         # [T, nx, S, 128]
    us_sl = to_sl(us, S)
    ws_sl = to_sl(ws, S)
    K_sl = to_sl(K, S)
    k_sl = to_sl(k, S)
    duals = jnp.zeros((T, spec.nc, S, 128), jnp.float32)
    pen = jnp.ones_like(duals)

    J0, c0 = ops_scan.al_objective(xs_sl, us_sl, ws_sl, duals, pen)
    slope = -jnp.ones((S, 128), jnp.float32)

    args = (xs_sl, us_sl, ws_sl, K_sl, k_sl, slope, J0, c0, duals, pen)
    ref = jax.jit(ops_scan.line_search)(*args)
    out = jax.jit(ops_pal.line_search)(*args)
    for r, o, name in zip(ref, out, ("xs", "us", "J", "c", "status", "a")):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), rtol=1e-5, atol=1e-6,
            err_msg=name,
        )


def test_eligibility_rules():
    """Non-uniform per-step dispatch disqualifies the kernels; forcing
    forward_kernel="pallas" on an ineligible spec raises."""
    from iterativelqr_tpu.core.spec import Constraint as C

    T = 9
    dynamics, objective, constraints, x1, xT = acrobot.problem(T)
    # distinct mid-horizon constraint type -> non-uniform dispatch
    u_bound = 8.0

    def con_a(x, u):
        return jnp.concatenate([u - u_bound, -u - u_bound])

    def con_b(x, u):
        return jnp.concatenate([u - 2 * u_bound, -u - 2 * u_bound])

    nx, nu = 4, 1
    mixed = (
        [C(con_a, nx, nu, indices_inequality=(0, 1))] * (T // 2)
        + [C(con_b, nx, nu, indices_inequality=(0, 1))] * (T - 1 - T // 2)
        + [constraints[-1]]
    )
    spec = build_spec(dynamics, objective, mixed)
    assert not fk.kernel_eligible(spec)
    with pytest.raises(ValueError, match="stage-uniform"):
        make_batched_solve_fn(
            spec, Options(forward_kernel="pallas", **_BASE), interpret=True
        )


def test_semantic_group_dedup():
    """Per-t duplicate stage objects (same fn + dims) collapse to one stage
    type (core/spec.py _group_key) — this is what keeps real per-t-rebuilt
    specs kernel-eligible."""
    T = 9
    dynamics, objective, constraints, *_ = acrobot.problem(T)
    spec = build_spec(dynamics, objective, constraints)
    assert len(np.unique(spec.con_tidx[: T - 1])) == 1
    assert fk.kernel_eligible(spec)
