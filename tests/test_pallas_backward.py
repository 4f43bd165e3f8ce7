"""Pallas batched backward kernel vs. the XLA scan path (interpreter mode).

CPU cannot execute compiled TPU kernels, so the kernel runs under
``interpret=True`` here; on TPU hardware the same code compiles via Mosaic.
The v1/v2 kernels are INTERNAL EXPERIMENTS (documented measured lessons
superseded by ops/packed_backward.py — see the module docstring); these
tests keep the lessons executable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterativelqr_tpu.ops.backward import backward_pass_scan
from iterativelqr_tpu.ops.pallas_backward import (
    backward_pass_batched_pallas,
    backward_pass_batched_pallas_v2,
    make_backward_dispatch,
)


def _random_batch(key, B, T, nx, nu, dtype=jnp.float32):
    ks = jax.random.split(key, 7)
    fx = 0.2 * jax.random.normal(ks[0], (B, T - 1, nx, nx), dtype) + jnp.eye(
        nx, dtype=dtype
    )
    fu = jax.random.normal(ks[1], (B, T - 1, nx, nu), dtype)
    gx = jax.random.normal(ks[2], (B, T, nx), dtype)
    gu = jax.random.normal(ks[3], (B, T - 1, nu), dtype)

    def spd(k, rows, d, scale=1.0):
        A = jax.random.normal(k, (B, rows, d, d), dtype)
        return scale * (A @ jnp.swapaxes(A, -1, -2)) + 2.0 * jnp.eye(d, dtype=dtype)

    gxx = spd(ks[4], T, nx, 0.5)
    guu = spd(ks[5], T - 1, nu)
    gux = 0.2 * jax.random.normal(ks[6], (B, T - 1, nu, nx), dtype)
    return fx, fu, gx, gu, gxx, guu, gux


@pytest.mark.parametrize("nx,nu,B", [(4, 1, 8), (3, 2, 8), (5, 3, 6)])
def test_pallas_kernel_matches_scan(nx, nu, B):
    T = 11
    args = _random_batch(jax.random.PRNGKey(0), B, T, nx, nu)
    u_mask = jnp.ones((T - 1, nu), bool)
    reg = jnp.zeros((B,), jnp.float32)

    ref = jax.vmap(
        lambda *a: backward_pass_scan(*a, u_mask, jnp.zeros((), jnp.float32))
    )(*args)
    out = backward_pass_batched_pallas(
        *args, u_mask, reg, block_b=8, interpret=True
    )
    names = ["K", "k", "Qx", "Qu", "p"]
    for name, a, b in zip(names, ref[:5], out[:5]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=name
        )
    assert bool(jnp.all(out[5]))


def test_pallas_kernel_padded_batch_and_masked_actions():
    """B not a multiple of block_b; one action dim masked off."""
    T, nx, nu, B = 9, 4, 2, 5
    args = _random_batch(jax.random.PRNGKey(1), B, T, nx, nu)
    fx, fu, gx, gu, gxx, guu, gux = args
    u_mask = jnp.ones((T - 1, nu), bool).at[:, -1].set(False)
    fu = fu.at[..., -1].set(0.0)
    gu = gu.at[..., -1].set(0.0)
    guu = guu.at[..., -1, :].set(0.0).at[..., :, -1].set(0.0)
    gux = gux.at[..., -1, :].set(0.0)
    reg = jnp.zeros((B,), jnp.float32)

    ref = jax.vmap(
        lambda *a: backward_pass_scan(*a, u_mask, jnp.zeros((), jnp.float32))
    )(fx, fu, gx, gu, gxx, guu, gux)
    out = backward_pass_batched_pallas(
        fx, fu, gx, gu, gxx, guu, gux, u_mask, reg, block_b=4, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(ref[0]), np.asarray(out[0]), rtol=2e-4, atol=2e-4
    )
    assert np.all(np.asarray(out[0])[:, :, -1, :] == 0.0)  # masked gain rows


@pytest.mark.parametrize("nx,nu,B", [(4, 1, 256), (3, 2, 300)])
def test_pallas_v2_matches_scan(nx, nu, B):
    """v2 (batch-in-sublanes + packed HBM streaming) vs the scan path,
    including a non-divisible batch."""
    T = 11
    args = _random_batch(jax.random.PRNGKey(3), B, T, nx, nu)
    u_mask = jnp.ones((T - 1, nu), bool)
    reg = jnp.zeros((B,), jnp.float32)
    ref = jax.vmap(
        lambda *a: backward_pass_scan(*a, u_mask, jnp.zeros((), jnp.float32))
    )(*args)
    out = backward_pass_batched_pallas_v2(
        *args, u_mask, reg, block_b=128, interpret=True
    )
    for a, b in zip(ref[:5], out[:5]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )
    assert bool(jnp.all(out[5]))


def test_dispatch_vmap_rule():
    """custom_vmap: vmapped dispatch == vmapped scan (interpret mode)."""
    T, nx, nu, B = 7, 3, 1, 4
    args = _random_batch(jax.random.PRNGKey(2), B, T, nx, nu)
    u_mask = jnp.ones((T - 1, nu), bool)
    dispatch = make_backward_dispatch(interpret=True, block_b=128)

    out = jax.vmap(
        lambda *a: dispatch(*a, u_mask, jnp.zeros((), jnp.float32))
    )(*args)
    ref = jax.vmap(
        lambda *a: backward_pass_scan(*a, u_mask, jnp.zeros((), jnp.float32))
    )(*args)
    for a, b in zip(ref[:5], out[:5]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )

    # unbatched call falls back to the scan path and agrees too
    single = dispatch(
        *(a[0] for a in args), u_mask, jnp.zeros((), jnp.float32)
    )
    for a, b in zip(ref[:5], single[:5]):
        np.testing.assert_allclose(
            np.asarray(a[0]), np.asarray(b), rtol=2e-4, atol=2e-4
        )


def test_pallas_option_demoted():
    """The v1 kernel is an internal experiment, not a selectable option:
    selecting it must fail fast with a pointer to its successor."""
    from iterativelqr_tpu import Options

    with pytest.raises(ValueError, match="packed"):
        Options(backward_pass="pallas")
