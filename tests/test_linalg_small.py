"""Unrolled small-matrix Cholesky/solve vs. stock implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterativelqr_tpu.ops import linalg_small


@pytest.mark.parametrize("m", [1, 2, 3, 4, 6, 8])
def test_cholesky_and_cho_solve(m):
    key = jax.random.PRNGKey(m)
    A = jax.random.normal(key, (32, m, m), jnp.float64)
    spd = A @ jnp.swapaxes(A, -1, -2) + 2.0 * jnp.eye(m)
    L = linalg_small.cholesky(spd)
    np.testing.assert_allclose(
        np.asarray(L), np.linalg.cholesky(np.asarray(spd)), rtol=1e-10, atol=1e-10
    )
    B = jax.random.normal(jax.random.PRNGKey(m + 100), (32, m, 3), jnp.float64)
    X = linalg_small.cho_solve(L, B)
    np.testing.assert_allclose(
        np.asarray(spd @ X), np.asarray(B), rtol=1e-8, atol=1e-8
    )


def test_cholesky_indefinite_gives_nan():
    A = jnp.array([[1.0, 2.0], [2.0, 1.0]])  # indefinite
    L = linalg_small.cholesky(A)
    assert not bool(jnp.all(jnp.isfinite(L)))


@pytest.mark.parametrize("m", [1, 2, 4, 6])
def test_general_solve(m):
    key = jax.random.PRNGKey(m)
    # well-conditioned M = I + PSD @ PSD (the associative-Riccati case)
    A = jax.random.normal(key, (16, m, m), jnp.float64)
    C = A @ jnp.swapaxes(A, -1, -2)
    Jm = 0.5 * C + jnp.eye(m)
    M = jnp.eye(m) + 0.3 * C @ Jm
    B = jax.random.normal(jax.random.PRNGKey(m + 7), (16, m, 2), jnp.float64)
    X = linalg_small.solve(M, B)
    np.testing.assert_allclose(
        np.asarray(M @ X), np.asarray(B), rtol=1e-8, atol=1e-8
    )
