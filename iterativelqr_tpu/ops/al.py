"""Augmented-Lagrangian constraint handling.

Functional counterpart of the reference's ``AugmentedLagrangianCosts`` wrapper
(reference: src/augmented_lagrangian.jl).  The AL machinery is a pure transform
on the stage cost and its derivatives: the iLQR core never knows constraints
exist, exactly mirroring the reference's duck-typed objective design
(SURVEY.md section 1).  All quantities are padded [T, nc] arrays; padded rows
evaluate to exactly zero so they contribute nothing anywhere.
"""

from __future__ import annotations

import jax.numpy as jnp


def active_set(c, duals, ineq_mask):
    """1.0 where the constraint enters the penalty, 0.0 otherwise.

    Inequality row i is *inactive* iff c_i < 0 and lambda_i == 0 (exact zero —
    duals start at zero and are clamped at zero, so the comparison is exact),
    matching reference src/augmented_lagrangian.jl:68-85.
    """
    inactive = ineq_mask & (c < 0.0) & (duals == 0.0)
    return jnp.where(inactive, 0.0, 1.0).astype(c.dtype)


def al_terms(c, duals, penalty, ineq_mask):
    """lambda'c + 1/2 sum_active rho_i c_i^2 (reference: src/augmented_lagrangian.jl:39-66)."""
    a = active_set(c, duals, ineq_mask)
    return jnp.sum(duals * c) + 0.5 * jnp.sum(a * penalty * c * c)


def max_violation(c, ineq_mask, c_mask):
    """Inf-norm violation: max(0, c) for inequality rows, |c| for equality rows
    (reference: src/data/constraints.jl:23-39)."""
    if c.size == 0:
        return jnp.zeros((), c.dtype)
    v = jnp.where(ineq_mask, jnp.maximum(c, 0.0), jnp.abs(c))
    v = jnp.where(c_mask, v, 0.0)
    return jnp.max(v)


def dual_update(c, duals, penalty, ineq_mask, scaling_penalty, max_penalty):
    """Dual ascent + geometric penalty schedule
    (reference: src/augmented_lagrangian.jl:87-110): lambda += rho*c, clamp
    lambda >= 0 on inequality rows, rho <- min(scale*rho, rho_max)."""
    new_duals = duals + penalty * c
    new_duals = jnp.where(ineq_mask, jnp.maximum(new_duals, 0.0), new_duals)
    new_penalty = jnp.minimum(scaling_penalty * penalty, max_penalty)
    return new_duals, new_penalty


def al_gradient_terms(c, cx, cu, duals, penalty, ineq_mask):
    """Gauss-Newton AL contributions to cost derivatives
    (reference: src/gradients.jl:54-80):

        gx  += cx' (lambda + Irho c)        gxx += cx' Irho cx
        gu  += cu' (lambda + Irho c)        guu += cu' Irho cu
                                            gux += cu' Irho cx
    where Irho = diag(rho * active).  Constraint curvature is dropped
    (Gauss-Newton), exactly as in the reference.
    """
    a = active_set(c, duals, ineq_mask)
    irho = penalty * a                      # [T, nc]
    ctmp = duals + irho * c                 # [T, nc]
    dgx = jnp.einsum("tcn,tc->tn", cx, ctmp)
    dgxx = jnp.einsum("tci,tc,tcj->tij", cx, irho, cx)
    dgu = jnp.einsum("tcm,tc->tm", cu, ctmp[:-1])
    dguu = jnp.einsum("tci,tc,tcj->tij", cu, irho[:-1], cu)
    dgux = jnp.einsum("tci,tc,tcj->tij", cu, irho[:-1], cx[:-1])
    return dgx, dgu, dgxx, dguu, dgux
