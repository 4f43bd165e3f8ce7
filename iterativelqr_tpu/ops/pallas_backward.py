"""Pallas TPU kernel: fused batched backward Riccati recursion.

The XLA path (ops/backward.py) runs the T-step recursion as a ``lax.scan``
whose per-step body, even fully fused, pays per-step kernel and HBM-carry
overhead for every timestep (measured ~45us/step at B=4096 after the
broadcast-multiply fusion).  This kernel runs the ENTIRE recursion for a
block of instances in one Pallas program: all stacked derivatives for the
block live in VMEM, the value-function carry (P, p) never leaves registers/
VMEM, and the per-timestep algebra is unrolled elementwise work on
batch-on-lanes tiles — the speed-of-light layout for huge-batch tiny-matrix
DDP (docs/design.md section 4).

Layout: inputs are transposed to ``[T, n, n, B]`` (batch innermost = lanes);
each grid program processes a ``block_b`` slice of the batch.  The matrix
dims (single digits) unroll in registers; Cholesky and triangular solves are
the static unrolled forms of ops/linalg_small.py restated for trailing-batch
layout.

Integration: ``make_backward_dispatch`` returns a drop-in for
``backward_pass_scan`` wrapped in ``jax.custom_batching.custom_vmap`` — the
unbatched call uses the XLA scan, and ``vmap`` (the batched solve) dispatches
the whole batch into this kernel.  Selected with
``Options(backward_pass="pallas")``; numerically identical to the scan path
(tests/test_pallas_backward.py runs the kernel in interpreter mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .backward import backward_pass_scan

DEFAULT_BLOCK_B = 256


# ---- trailing-batch small-matrix algebra ----------------------------------


def _mm(a, b):
    """(i,k,B),(k,j,B) -> (i,j,B)"""
    return jnp.sum(a[:, :, None, :] * b[None, :, :, :], axis=1)


def _mv(a, v):
    """(i,k,B),(k,B) -> (i,B)"""
    return jnp.sum(a * v[None, :, :], axis=1)


def _transpose(a):
    """(i,j,B) -> (j,i,B)"""
    return jnp.swapaxes(a, 0, 1)


def _cholesky_tb(A, m):
    """Unrolled Cholesky of (m,m,B) PSD matrices; NaN on bad pivots."""
    L = [[None] * m for _ in range(m)]
    for i in range(m):
        for j in range(i + 1):
            s = A[i, j]
            for kk in range(j):
                s = s - L[i][kk] * L[j][kk]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    return L


def _cho_solve_tb(L, B_cols, m):
    """Solve A X = B given unrolled factor ``L``; B_cols is a list of k
    columns, each (m, B).  Returns list of k columns (m, B)."""
    outs = []
    for col in B_cols:
        y = [None] * m
        for i in range(m):
            s = col[i]
            for kk in range(i):
                s = s - L[i][kk] * y[kk]
            y[i] = s / L[i][i]
        x = [None] * m
        for i in range(m - 1, -1, -1):
            s = y[i]
            for kk in range(i + 1, m):
                s = s - L[kk][i] * x[kk]
            x[i] = s / L[i][i]
        outs.append(jnp.stack(x, axis=0))
    return outs


# ---- kernel ----------------------------------------------------------------


def _kernel(n, m, Tm1,
            fx_ref, fu_ref, gx_ref, gu_ref, gxx_ref, guu_ref, gux_ref,
            um_ref, reg_ref,
            K_ref, k_ref, Qx_ref, Qu_ref, p_ref, ok_ref):
    # reg/ok travel as (1, B): Mosaic rejects 1-D blocked windows under a grid
    reg = reg_ref[0]          # (B,)
    P0 = gxx_ref[Tm1]         # (n, n, B) terminal init
    p0 = gx_ref[Tm1]          # (n, B)
    ok0 = jnp.ones_like(reg)  # 1.0 = all factorizations PD so far

    def body(i, carry):
        P, p, ok = carry
        t = Tm1 - 1 - i
        fx_t = fx_ref[t]      # (n, n, B)
        fu_t = fu_ref[t]      # (n, m, B)
        gx_t = gx_ref[t]      # (n, B)
        gu_t = gu_ref[t]      # (m, B)
        gxx_t = gxx_ref[t]
        guu_t = guu_ref[t]    # (m, m, B)
        gux_t = gux_ref[t]    # (m, n, B)
        um_t = um_ref[t]      # (m, B) float mask (broadcast over batch)

        fxT = _transpose(fx_t)
        fuT = _transpose(fu_t)
        Qx = gx_t + _mv(fxT, p)
        Qu = gu_t + _mv(fuT, p)
        fxTP = _mm(fxT, P)
        fuTP = _mm(fuT, P)
        Qxx = gxx_t + _mm(fxTP, fx_t)
        Quu = guu_t + _mm(fuTP, fu_t)
        Qux = gux_t + _mm(fuTP, fx_t)

        mask2 = um_t[:, None, :] * um_t[None, :, :]
        eye_m = jnp.eye(m, dtype=Quu.dtype)[:, :, None]
        Quu_eff = Quu * mask2 + eye_m * (1.0 - um_t[None, :, :])
        Quu_reg = Quu_eff + eye_m * (reg[None, None, :] * um_t[None, :, :])

        L = _cholesky_tb(Quu_reg, m)
        ok_t = ok
        for i_d in range(m):
            d = L[i_d][i_d]
            good = jnp.isfinite(d) & (d > 0.0)
            ok_t = ok_t * good.astype(ok_t.dtype)

        # columns of [Qux | Qu]
        cols = [Qux[:, j, :] for j in range(n)] + [Qu]
        sols = _cho_solve_tb(L, cols, m)
        K = -jnp.stack(sols[:n], axis=1) * um_t[:, None, :]   # (m, n, B)
        kff = -sols[n] * um_t                                  # (m, B)

        KT = _transpose(K)
        QuxT = _transpose(Qux)
        QuuK = _mm(Quu_eff, K)
        P_new = Qxx + _mm(KT, QuuK) + _mm(KT, Qux) + _mm(QuxT, K)
        P_new = 0.5 * (P_new + _transpose(P_new))
        p_new = Qx + _mv(_transpose(QuuK), kff) + _mv(KT, Qu) + _mv(QuxT, kff)

        K_ref[t] = K
        k_ref[t] = kff
        Qx_ref[t] = Qx
        Qu_ref[t] = Qu
        p_ref[t] = p_new
        return (P_new, p_new, ok_t)

    _, _, ok = jax.lax.fori_loop(0, Tm1, body, (P0, p0, ok0))
    ok_ref[0, :] = ok


def _round_up(x, mult):
    return ((x + mult - 1) // mult) * mult


def backward_pass_batched_pallas(
    fx, fu, gx, gu, gxx, guu, gux, u_mask, reg,
    block_b: int = DEFAULT_BLOCK_B, interpret: bool = False,
):
    """Whole-batch backward pass.

    Args (batch-leading, as produced by the vmapped solve):
      fx [B,T-1,n,n], fu [B,T-1,n,m], gx [B,T,n], gu [B,T-1,m],
      gxx [B,T,n,n], guu [B,T-1,m,m], gux [B,T-1,m,n],
      u_mask [T-1,m] bool (shared), reg [B].
    Returns (K [B,T-1,m,n], k [B,T-1,m], Qx [B,T-1,n], Qu [B,T-1,m],
    p [B,T-1,n], ok [B] bool).
    """
    B, Tm1, n, _ = fx.shape
    m = fu.shape[-1]
    T = Tm1 + 1
    dtype = fx.dtype

    Bp = _round_up(B, block_b)

    def prep(a, perm):
        a = jnp.transpose(a, perm)  # batch to last
        if Bp != B:
            pad = [(0, 0)] * (a.ndim - 1) + [(0, Bp - B)]
            a = jnp.pad(a, pad)
        return a

    fx_t = prep(fx, (1, 2, 3, 0))
    fu_t = prep(fu, (1, 2, 3, 0))
    gx_t = prep(gx, (1, 2, 0))
    gu_t = prep(gu, (1, 2, 0))
    gxx_t = prep(gxx, (1, 2, 3, 0))
    guu_t = prep(guu, (1, 2, 3, 0))
    gux_t = prep(gux, (1, 2, 3, 0))
    um = jnp.broadcast_to(
        u_mask.astype(dtype)[:, :, None], (Tm1, m, Bp)
    )
    # padded batch entries: reg=1, guu=I so the factorization stays PD
    reg_p = jnp.pad(reg.astype(dtype), (0, Bp - B)) if Bp != B else reg.astype(dtype)
    if Bp != B:
        eye_pad = jnp.zeros((Tm1, m, m, Bp), dtype).at[:, :, :, B:].set(
            jnp.eye(m, dtype=dtype)[None, :, :, None]
        )
        guu_t = guu_t + eye_pad

    grid = (Bp // block_b,)

    def spec(*dims):
        nd = len(dims)
        return pl.BlockSpec(
            dims + (block_b,),
            (lambda i, _nd=nd: (0,) * _nd + (i,)),
            memory_space=pltpu.VMEM,
        )

    out_shape = (
        jax.ShapeDtypeStruct((Tm1, m, n, Bp), dtype),  # K
        jax.ShapeDtypeStruct((Tm1, m, Bp), dtype),     # k
        jax.ShapeDtypeStruct((Tm1, n, Bp), dtype),     # Qx
        jax.ShapeDtypeStruct((Tm1, m, Bp), dtype),     # Qu
        jax.ShapeDtypeStruct((Tm1, n, Bp), dtype),     # p
        jax.ShapeDtypeStruct((1, Bp), dtype),          # ok (1.0 / 0.0)
    )
    in_specs = [
        spec(Tm1, n, n),   # fx
        spec(Tm1, n, m),   # fu
        spec(T, n),        # gx
        spec(Tm1, m),      # gu
        spec(T, n, n),     # gxx
        spec(Tm1, m, m),   # guu
        spec(Tm1, m, n),   # gux
        spec(Tm1, m),      # um
        spec(1),           # reg as (1, B)
    ]
    out_specs = (
        spec(Tm1, m, n),
        spec(Tm1, m),
        spec(Tm1, n),
        spec(Tm1, m),
        spec(Tm1, n),
        spec(1),
    )

    kernel = functools.partial(_kernel, n, m, Tm1)
    K_t, k_t, Qx_t, Qu_t, p_t, ok_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(fx_t, fu_t, gx_t, gu_t, gxx_t, guu_t, gux_t, um, reg_p[None, :])

    def unprep(a, perm):
        a = a[..., :B] if Bp != B else a
        return jnp.transpose(a, perm)

    K = unprep(K_t, (3, 0, 1, 2))
    k = unprep(k_t, (2, 0, 1))
    Qx = unprep(Qx_t, (2, 0, 1))
    Qu = unprep(Qu_t, (2, 0, 1))
    p = unprep(p_t, (2, 0, 1))
    ok = ok_t[0, :B] > 0.5
    return K, k, Qx, Qu, p, ok


def make_backward_dispatch(unroll: int = 1, block_b: int = DEFAULT_BLOCK_B,
                           interpret: bool = False):
    """A backward_pass_scan drop-in whose vmap rule runs the Pallas kernel.

    Unbatched calls (single-instance solves) use the XLA reverse scan; under
    ``jax.vmap`` (the batched solve) the whole batch enters one kernel.
    """

    @jax.custom_batching.custom_vmap
    def dispatch(fx, fu, gx, gu, gxx, guu, gux, u_mask, reg):
        return backward_pass_scan(
            fx, fu, gx, gu, gxx, guu, gux, u_mask, reg, unroll=unroll
        )

    @dispatch.def_vmap
    def _vmap_rule(axis_size, in_batched, fx, fu, gx, gu, gxx, guu, gux, u_mask, reg):
        (fx_b, fu_b, gx_b, gu_b, gxx_b, guu_b, gux_b, um_b, reg_b) = in_batched
        if not (fx_b and fu_b and gx_b and gu_b and gxx_b and guu_b and gux_b):
            raise NotImplementedError(
                "pallas backward dispatch expects derivative stacks batched "
                "on the leading axis"
            )
        um = u_mask[0] if um_b else u_mask
        reg_v = reg if reg_b else jnp.broadcast_to(reg, (axis_size,))
        out = backward_pass_batched_pallas(
            fx, fu, gx, gu, gxx, guu, gux, um, reg_v,
            block_b=block_b, interpret=interpret,
        )
        return out, tuple(True for _ in out)

    return dispatch
