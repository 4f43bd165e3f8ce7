"""Unit tests: program cache (jax.export) and checkpoint round-trips."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from iterativelqr_tpu import Options
from iterativelqr_tpu.core.mpc import MPCState
from iterativelqr_tpu.core.solve import make_solve_fn
from iterativelqr_tpu.core.spec import build_spec
from iterativelqr_tpu.models import particle
from iterativelqr_tpu.utils import checkpoint
from iterativelqr_tpu.utils.program_cache import cached_program


def test_program_cache_roundtrip(tmp_path):
    T = 7
    dynamics, objective, constraints, x1, xT = particle.problem(T)
    spec = build_spec(dynamics, objective, constraints)
    opts = Options(verbose=False)
    xs = jnp.zeros((T, spec.nx), jnp.float64)
    us = jnp.zeros((T - 1, spec.nu), jnp.float64)
    ws = jnp.zeros((T, max(spec.npar, 0)), jnp.float64)

    calls = []

    def make():
        calls.append(1)
        return make_solve_fn(spec, opts)

    fn1 = cached_program(make, "t_cache", (xs, us, ws), cache_dir=str(tmp_path))
    out1 = fn1(xs, us, ws)
    assert len(calls) == 1
    fn2 = cached_program(make, "t_cache", (xs, us, ws), cache_dir=str(tmp_path))
    out2 = fn2(xs, us, ws)
    assert len(calls) == 1  # hit: make() not called again
    np.testing.assert_array_equal(np.asarray(out1.xs), np.asarray(out2.xs))
    np.testing.assert_array_equal(np.asarray(out1.us), np.asarray(out2.us))
    # different key -> fresh lowering
    cached_program(make, "t_cache_2", (xs, us, ws), cache_dir=str(tmp_path))
    assert len(calls) == 2


def _state():
    return MPCState(
        xs=jnp.arange(6.0).reshape(3, 2),
        us=jnp.ones((2, 1)),
        duals=jnp.zeros((3, 2)),
        penalty=jnp.full((3, 2), 10.0),
    )


def _like():
    s = _state()
    return jax.tree.map(jnp.zeros_like, s)


def test_checkpoint_roundtrip(tmp_path):
    state = _state()
    p = checkpoint.save(os.path.join(str(tmp_path), "ckpt"), state)
    restored = checkpoint.load(p, _like())
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_npz_fallback(tmp_path, monkeypatch):
    monkeypatch.setattr(checkpoint, "_ocp", None)
    state = _state()
    p = checkpoint.save(os.path.join(str(tmp_path), "ckpt"), state)
    assert p.endswith(".npz")
    restored = checkpoint.load(p, _like())
    np.testing.assert_array_equal(
        np.asarray(restored.penalty), np.asarray(state.penalty)
    )
