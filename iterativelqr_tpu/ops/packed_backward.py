"""Pallas TPU kernel v3: chunked-DMA batched backward Riccati recursion.

Why v2 (ops/pallas_backward.py) is ~10x off roofline: it issues ONE ~200KB
DMA per timestep and waits on it with only a single prefetch in flight, so
the loop pays HBM round-trip latency (~2us) per step against ~0.3us of
compute — the recursion is latency-bound, not bandwidth- or compute-bound.

v3 fixes the structure:

* **Chunked streaming**: one DMA brings ``chunk`` timesteps of the packed
  derivative buffer (``[chunk, F, sub, 128]``, ~1.5MB) into VMEM; the inner
  chunk loop is statically unrolled.  DMA count drops T/chunk-fold and each
  transfer is large enough to hit streaming bandwidth.
* **Mask-free kernel**: padded action dimensions have exactly-zero
  derivatives by construction (core/spec.py pads with zeros before
  differentiation), so the only fixup needed is a unit diagonal on ``guu``'s
  invalid dims — applied once on the XLA side during packing
  (``pack_stacks``).  All per-step mask reads/selects disappear from the
  inner loop.
* **Pass-through horizon padding**: T-1 is padded to a multiple of ``chunk``
  with identity steps (fx=I, guu=I, rest 0) that leave the value function
  unchanged, so the kernel needs no remainder handling.

The packed layout ``[Tp, F, S, 128]`` (F = nx*nx + nx*nu + nx + nu + nx*nx +
nu*nu + nu*nx slots, batch split into sublanes x lanes) is also the layout
the fused batch-trailing derive emits natively (ops/packed_pipeline.py),
which is what removes the relayout transposes that made kernel wins
end-to-end losses in round 1 (VERDICT r1 next #1).

Reference recursion: src/backward_pass.jl:42-90.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_B = 1024
DEFAULT_CHUNK = 8


def _mm(a, b):
    """(i,k,S,L),(k,j,S,L) -> (i,j,S,L)"""
    return jnp.sum(a[:, :, None] * b[None, :, :], axis=1)


def _mv(a, v):
    """(i,k,S,L),(k,S,L) -> (i,S,L)"""
    return jnp.sum(a * v[None], axis=1)


def _t(a):
    return jnp.swapaxes(a, 0, 1)


def _chol(A, m):
    L = [[None] * m for _ in range(m)]
    for i in range(m):
        for j in range(i + 1):
            s = A[i, j]
            for kk in range(j):
                s = s - L[i][kk] * L[j][kk]
            L[i][j] = jnp.sqrt(s) if i == j else s / L[j][j]
    return L


def _chol_solve(L, cols, m):
    outs = []
    for col in cols:
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


def _offsets(n, m):
    o_fx = 0
    o_fu = o_fx + n * n
    o_gx = o_fu + n * m
    o_gu = o_gx + n
    o_gxx = o_gu + m
    o_guu = o_gxx + n * n
    o_gux = o_guu + m * m
    F = o_gux + m * n
    return o_fx, o_fu, o_gx, o_gu, o_gxx, o_guu, o_gux, F


def _kernel(n, m, Tp, chunk, sub,
            packed_hbm, gxxT_ref, gxT_ref, reg_ref,
            K_ref, k_ref, Qx_ref, Qu_ref, p_ref, ok_ref,
            scratch, sems):
    i = pl.program_id(0)
    row0 = pl.multiple_of(i * sub, sub)
    o_fx, o_fu, o_gx, o_gu, o_gxx, o_guu, o_gux, F = _offsets(n, m)
    nchunks = Tp // chunk

    def dma(slot, c):
        return pltpu.make_async_copy(
            packed_hbm.at[pl.ds(c * chunk, chunk), :, pl.ds(row0, sub), :],
            scratch.at[slot],
            sems.at[slot],
        )

    dma(0, nchunks - 1).start()

    reg = reg_ref[0]          # (sub, 128)
    P0 = gxxT_ref[:]          # (n, n, sub, 128)
    p0 = gxT_ref[:]           # (n, sub, 128)
    ok0 = jnp.ones_like(reg)

    def chunk_body(ci, carry):
        P, p, ok = carry
        c = nchunks - 1 - ci
        slot = ci % 2

        @pl.when(ci + 1 < nchunks)
        def _():
            dma(1 - slot, c - 1).start()

        dma(slot, c).wait()
        buf = scratch[slot]                               # (chunk, F, sub, L)

        for j in range(chunk - 1, -1, -1):                # static unroll
            row = buf[j]
            S, Lw = row.shape[-2], row.shape[-1]
            fx = row[o_fx:o_fu].reshape(n, n, S, Lw)
            fu = row[o_fu:o_gx].reshape(n, m, S, Lw)
            gx = row[o_gx:o_gu]
            gu = row[o_gu:o_gxx]
            gxx = row[o_gxx:o_guu].reshape(n, n, S, Lw)
            guu = row[o_guu:o_gux].reshape(m, m, S, Lw)
            gux = row[o_gux:F].reshape(m, n, S, Lw)

            fxT = _t(fx)
            fuT = _t(fu)
            Qx = gx + _mv(fxT, p)
            Qu = gu + _mv(fuT, p)
            fxTP = _mm(fxT, P)
            fuTP = _mm(fuT, P)
            Qxx = gxx + _mm(fxTP, fx)
            Quu = guu + _mm(fuTP, fu)
            Qux = gux + _mm(fuTP, fx)

            # regularized factor: reg on the whole diagonal (padded dims
            # carry a unit diagonal from packing; their Qux/Qu rows are 0 so
            # gains stay 0 regardless)
            Quu_reg = [
                [Quu[a, b] + (reg if a == b else 0.0) for b in range(m)]
                for a in range(m)
            ]
            Lf = _chol(
                jnp.stack([jnp.stack(r, axis=0) for r in Quu_reg], axis=0), m
            )
            ok_t = ok
            for a in range(m):
                d = Lf[a][a]
                ok_t = ok_t * (jnp.isfinite(d) & (d > 0.0)).astype(ok_t.dtype)
            ok = ok_t

            cols = [Qux[:, jj] for jj in range(n)] + [Qu]
            sols = _chol_solve(Lf, cols, m)
            K = -jnp.stack(sols[:n], axis=1)              # (m, n, S, L)
            kff = -sols[n]                                # (m, S, L)

            KT = _t(K)
            QuxT = _t(Qux)
            QuuK = _mm(Quu, K)                            # unregularized
            P = Qxx + _mm(KT, QuuK) + _mm(KT, Qux) + _mm(QuxT, K)
            P = 0.5 * (P + _t(P))
            p = Qx + _mv(_t(QuuK), kff) + _mv(KT, Qu) + _mv(QuxT, kff)

            t = c * chunk + j
            K_ref[t] = K
            k_ref[t] = kff
            Qx_ref[t] = Qx
            Qu_ref[t] = Qu
            p_ref[t] = p
        return (P, p, ok)

    _, _, ok = jax.lax.fori_loop(
        0, nchunks, chunk_body, (P0, p0, ok0)
    )
    ok_ref[0] = ok


def _round_up(x, mult):
    return ((x + mult - 1) // mult) * mult


def pack_stacks(fx, fu, gx, gu, gxx, guu, gux, u_mask,
                block_b=DEFAULT_BLOCK_B, chunk=DEFAULT_CHUNK):
    """Batch-leading stacks -> (packed [Tp,F,S,128], gxxT, gxT, meta).

    Applies the padded-action fixup (unit diagonal on guu's invalid dims) and
    pass-through horizon padding here, so the kernel itself is mask-free.
    """
    B, Tm1, n, _ = fx.shape
    m = fu.shape[-1]
    dtype = fx.dtype
    Bp = _round_up(B, block_b)
    S_all = Bp // 128
    Tp = _round_up(Tm1, chunk)
    *_, F = _offsets(n, m)

    um = u_mask.astype(dtype)                            # [Tm1, m]
    # unit diagonal on invalid action dims (their derivative rows/cols are
    # exactly zero by construction)
    guu = guu + (jnp.eye(m, dtype=dtype)[None] * (1.0 - um)[:, None, :])[None]

    def lay(a, d):
        """[B, Tm1, *dims] -> [Tm1, d, S_all, 128] (pad batch)."""
        a = jnp.moveaxis(a, 0, -1)
        if Bp != B:
            a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, Bp - B)])
        return a.reshape(a.shape[0], d, S_all, 128)

    parts = [
        lay(fx, n * n),
        lay(fu, n * m),
        lay(gx[:, :-1], n),
        lay(gu, m),
        lay(gxx[:, :-1], n * n),
        lay(guu, m * m),
        lay(gux, m * n),
    ]
    packed = jnp.concatenate(parts, axis=1)              # [Tm1, F, S, 128]
    if Tp != Tm1:
        # pass-through steps: fx = I, guu = I, everything else 0
        eye_n = jnp.eye(n, dtype=dtype).reshape(n * n)
        eye_m = jnp.eye(m, dtype=dtype).reshape(m * m)
        pad_row = jnp.zeros((F,), dtype)
        o = _offsets(n, m)
        pad_row = pad_row.at[o[0] : o[0] + n * n].set(eye_n)
        pad_row = pad_row.at[o[5] : o[5] + m * m].set(eye_m)
        pad_block = jnp.broadcast_to(
            pad_row[None, :, None, None], (Tp - Tm1, F, S_all, 128)
        )
        packed = jnp.concatenate([packed, pad_block], axis=0)

    def lay_term(a, *dims):
        a = jnp.moveaxis(a, 0, -1)
        if Bp != B:
            a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, Bp - B)])
        return a.reshape(*dims, S_all, 128)

    gxxT = lay_term(gxx[:, -1], n, n)
    gxT = lay_term(gx[:, -1], n)
    meta = dict(B=B, Bp=Bp, Tm1=Tm1, Tp=Tp, n=n, m=m, S_all=S_all)
    return packed, gxxT, gxT, meta


def pack_stacks_bt(fx, fu, gx, gu, gxx, guu, gux, u_mask,
                   block_b=DEFAULT_BLOCK_B, chunk=DEFAULT_CHUNK):
    """Batch-TRAILING stacks (fx [Tm1,n,n,B], gx [T,n,B], ...) -> packed.

    The batch-trailing layout means every reshape here is a view (no
    transposes); this is the entry used by the fused derive pipeline
    (ops/packed_pipeline.py).
    """
    Tm1, n, _, B = fx.shape
    m = fu.shape[2]
    dtype = fx.dtype
    Bp = _round_up(B, block_b)
    S_all = Bp // 128
    Tp = _round_up(Tm1, chunk)
    *_, F = _offsets(n, m)

    um = u_mask.astype(dtype)                                # [Tm1, m]
    guu = guu + (jnp.eye(m, dtype=dtype)[None] * (1.0 - um)[:, None, :])[
        ..., None
    ]

    def lay(a, d):
        if Bp != B:
            a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, Bp - B)])
        return a.reshape(a.shape[0], d, S_all, 128)

    packed = jnp.concatenate(
        [
            lay(fx, n * n),
            lay(fu, n * m),
            lay(gx[:-1], n),
            lay(gu, m),
            lay(gxx[:-1], n * n),
            lay(guu, m * m),
            lay(gux, m * n),
        ],
        axis=1,
    )
    if Tp != Tm1:
        eye_n = jnp.eye(n, dtype=dtype).reshape(n * n)
        eye_m = jnp.eye(m, dtype=dtype).reshape(m * m)
        o = _offsets(n, m)
        pad_row = jnp.zeros((F,), dtype)
        pad_row = pad_row.at[o[0] : o[0] + n * n].set(eye_n)
        pad_row = pad_row.at[o[5] : o[5] + m * m].set(eye_m)
        packed = jnp.concatenate(
            [
                packed,
                jnp.broadcast_to(
                    pad_row[None, :, None, None], (Tp - Tm1, F, S_all, 128)
                ),
            ],
            axis=0,
        )

    def lay_term(a, *dims):
        if Bp != B:
            a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, Bp - B)])
        return a.reshape(*dims, S_all, 128)

    gxxT = lay_term(gxx[-1], n, n)
    gxT = lay_term(gx[-1], n)
    meta = dict(B=B, Bp=Bp, Tm1=Tm1, Tp=Tp, n=n, m=m, S_all=S_all)
    return packed, gxxT, gxT, meta


def unflatten_bt(a, meta):
    """Kernel output [Tm1, *dims, S, 128] -> batch-trailing [Tm1, *dims, B]."""
    B, Bp = meta["B"], meta["Bp"]
    a = a.reshape(a.shape[:-2] + (Bp,))
    return a[..., :B]


def ok_vector(outs, meta):
    """[B]-bool PD-success vector from kernel outputs."""
    B, Bp = meta["B"], meta["Bp"]
    ok_t = outs[5]
    return ok_t.reshape(Bp)[:B] > 0.5


def backward_pass_packed(packed, gxxT, gxT, reg, meta,
                         block_b=DEFAULT_BLOCK_B, chunk=DEFAULT_CHUNK,
                         interpret: bool = False):
    """Run the recursion on pre-packed operands.

    ``reg`` is [B] (per-instance).  Returns batch-trailing outputs
    (K [Tm1,m,n,S,128], k, Qx, Qu, p, ok [S,128]) — callers that need
    batch-leading use ``unpack_outputs``.
    """
    B, Bp, Tm1, Tp = meta["B"], meta["Bp"], meta["Tm1"], meta["Tp"]
    n, m, S_all = meta["n"], meta["m"], meta["S_all"]
    dtype = packed.dtype
    sub = block_b // 128
    assert block_b % 128 == 0 and Bp % block_b == 0

    reg_l = reg.astype(dtype)
    if Bp != B:
        # padded instances: reg 0 (their guu slots are zero -> factorization
        # of 0+0 diag would fail; give them a benign unit diagonal instead)
        reg_l = jnp.pad(reg_l, (0, Bp - B))
    reg_l = reg_l.reshape(1, S_all, 128)
    if Bp != B:
        # unit guu diagonal for padded batch lanes
        o = _offsets(n, m)
        eye_flat = jnp.eye(m, dtype=dtype).reshape(m * m)
        pad_mask = (jnp.arange(Bp) >= B).astype(dtype).reshape(S_all, 128)
        packed = packed.at[:, o[5] : o[5] + m * m].add(
            eye_flat[None, :, None, None] * pad_mask[None, None]
        )

    grid = (Bp // block_b,)

    def vspec(*dims):
        nd = len(dims)
        return pl.BlockSpec(
            dims + (sub, 128),
            (lambda i, _nd=nd: (0,) * _nd + (i, 0)),
            memory_space=pltpu.VMEM,
        )

    *_, F = _offsets(n, m)
    out_shape = (
        jax.ShapeDtypeStruct((Tp, m, n, S_all, 128), dtype),   # K
        jax.ShapeDtypeStruct((Tp, m, S_all, 128), dtype),      # k
        jax.ShapeDtypeStruct((Tp, n, S_all, 128), dtype),      # Qx
        jax.ShapeDtypeStruct((Tp, m, S_all, 128), dtype),      # Qu
        jax.ShapeDtypeStruct((Tp, n, S_all, 128), dtype),      # p
        jax.ShapeDtypeStruct((1, S_all, 128), dtype),          # ok
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),                  # packed (HBM)
        vspec(n, n),
        vspec(n),
        vspec(1),
    ]
    out_specs = (
        vspec(Tp, m, n), vspec(Tp, m), vspec(Tp, n), vspec(Tp, m),
        vspec(Tp, n), vspec(1),
    )
    kernel = functools.partial(_kernel, n, m, Tp, chunk, sub)
    K_t, k_t, Qx_t, Qu_t, p_t, ok_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, chunk, F, sub, 128), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(packed, gxxT, gxT, reg_l)
    return (
        K_t[:Tm1], k_t[:Tm1], Qx_t[:Tm1], Qu_t[:Tm1], p_t[:Tm1], ok_t[0]
    )


def unpack_outputs(outs, meta):
    """Batch-trailing kernel outputs -> batch-leading (K [B,Tm1,m,n], ...)."""
    B, Bp = meta["B"], meta["Bp"]
    K_t, k_t, Qx_t, Qu_t, p_t, ok_t = outs

    def unlay(a, *dims):
        a = a.reshape(a.shape[0], *dims, Bp)
        return jnp.moveaxis(a, -1, 0)[:B]

    m, n = meta["m"], meta["n"]
    K = unlay(K_t, m, n)
    k = unlay(k_t, m)
    Qx = unlay(Qx_t, n)
    Qu = unlay(Qu_t, m)
    p = unlay(p_t, n)
    ok = jnp.moveaxis(ok_t.reshape(1, Bp), -1, 0)[:B, 0] > 0.5
    return K, k, Qx, Qu, p, ok


def backward_pass_batched_pallas_v3(
    fx, fu, gx, gu, gxx, guu, gux, u_mask, reg,
    block_b: int = DEFAULT_BLOCK_B, chunk: int = DEFAULT_CHUNK,
    interpret: bool = False,
):
    """Drop-in batched entry (same contract as the v1/v2 kernels): packs
    batch-leading stacks, runs the chunked kernel, unpacks."""
    packed, gxxT, gxT, meta = pack_stacks(
        fx, fu, gx, gu, gxx, guu, gux, u_mask, block_b=block_b, chunk=chunk
    )
    outs = backward_pass_packed(
        packed, gxxT, gxT, reg, meta,
        block_b=block_b, chunk=chunk, interpret=interpret,
    )
    return unpack_outputs(outs, meta)


# ---------------------------------------------------------------------------
# v4 "multiref": per-stack DMA — no packed concat at all
# ---------------------------------------------------------------------------
#
# pack_stacks_bt's concat re-tiles every stack (their [T, d, B] intermediates
# carry tiny second-minor dims), measured ~4ms at B=4096 — 50x the kernel
# itself.  v4 instead takes the SEVEN stacks as separate HBM refs already in
# tile-aligned [T, *dims, S, 128] form (the fused derive emits exactly this)
# and issues seven chunked DMAs per buffer slot.  Nothing is ever
# re-laid-out.


def _riccati_step(n, m, reg, P, p, ok, fx, fu, gx, gu, gxx, guu, gux):
    """One backward Riccati step on (.., S, L) operands; returns
    (K, kff, Qx, Qu, P_new, p_new, ok)."""
    fxT = _t(fx)
    fuT = _t(fu)
    Qx = gx + _mv(fxT, p)
    Qu = gu + _mv(fuT, p)
    fxTP = _mm(fxT, P)
    fuTP = _mm(fuT, P)
    Qxx = gxx + _mm(fxTP, fx)
    Quu = guu + _mm(fuTP, fu)
    Qux = gux + _mm(fuTP, fx)

    Quu_reg = [
        [Quu[a, b] + (reg if a == b else 0.0) for b in range(m)]
        for a in range(m)
    ]
    Lf = _chol(
        jnp.stack([jnp.stack(r, axis=0) for r in Quu_reg], axis=0), m
    )
    for a in range(m):
        d = Lf[a][a]
        ok = ok * (jnp.isfinite(d) & (d > 0.0)).astype(ok.dtype)

    cols = [Qux[:, jj] for jj in range(n)] + [Qu]
    sols = _chol_solve(Lf, cols, m)
    K = -jnp.stack(sols[:n], axis=1)
    kff = -sols[n]

    KT = _t(K)
    QuxT = _t(Qux)
    QuuK = _mm(Quu, K)
    P_new = Qxx + _mm(KT, QuuK) + _mm(KT, Qux) + _mm(QuxT, K)
    P_new = 0.5 * (P_new + _t(P_new))
    p_new = Qx + _mv(_t(QuuK), kff) + _mv(KT, Qu) + _mv(QuxT, kff)
    return K, kff, Qx, Qu, P_new, p_new, ok


def _kernel_mr(n, m, Tp, chunk, sub,
               fx_hbm, fu_hbm, gx_hbm, gu_hbm, gxx_hbm, guu_hbm, gux_hbm,
               gxxT_ref, gxT_ref, reg_ref,
               K_ref, k_ref, Qx_ref, Qu_ref, p_ref, ok_ref,
               fx_s, fu_s, gx_s, gu_s, gxx_s, guu_s, gux_s, sems):
    i = pl.program_id(0)
    row0 = pl.multiple_of(i * sub, sub)
    nchunks = Tp // chunk
    hbms = [fx_hbm, fu_hbm, gx_hbm, gu_hbm, gxx_hbm, guu_hbm, gux_hbm]
    bufs = [fx_s, fu_s, gx_s, gu_s, gxx_s, guu_s, gux_s]

    def dma(slot, c, kk):
        h, b = hbms[kk], bufs[kk]
        mid = h.ndim - 3  # middle (matrix/vector) dims between T and (S, L)
        idx = (
            (pl.ds(c * chunk, chunk),)
            + (slice(None),) * mid
            + (pl.ds(row0, sub), slice(None))
        )
        return pltpu.make_async_copy(h.at[idx], b.at[slot], sems.at[slot, kk])

    def start_all(slot, c):
        for kk in range(7):
            dma(slot, c, kk).start()

    def wait_all(slot, c):
        for kk in range(7):
            dma(slot, c, kk).wait()

    start_all(0, nchunks - 1)

    reg = reg_ref[0]
    P0 = gxxT_ref[:]
    p0 = gxT_ref[:]
    ok0 = jnp.ones_like(reg)

    def chunk_body(ci, carry):
        P, p, ok = carry
        c = nchunks - 1 - ci
        slot = ci % 2

        @pl.when(ci + 1 < nchunks)
        def _():
            start_all(1 - slot, c - 1)

        wait_all(slot, c)

        for j in range(chunk - 1, -1, -1):
            K, kff, Qx, Qu, P, p, ok = _riccati_step(
                n, m, reg, P, p, ok,
                fx_s[slot, j], fu_s[slot, j], gx_s[slot, j], gu_s[slot, j],
                gxx_s[slot, j], guu_s[slot, j], gux_s[slot, j],
            )
            t = c * chunk + j
            K_ref[t] = K
            k_ref[t] = kff
            Qx_ref[t] = Qx
            Qu_ref[t] = Qu
            p_ref[t] = p
        return (P, p, ok)

    _, _, ok = jax.lax.fori_loop(0, nchunks, chunk_body, (P0, p0, ok0))
    ok_ref[0] = ok


def _kernel_mr_stream(n, m, Tp, chunk, sub,
                      fx_hbm, fu_hbm, gx_hbm, gu_hbm, gxx_hbm, guu_hbm,
                      gux_hbm, gxxT_ref, gxT_ref, reg_ref,
                      out_hbm, ok_ref,
                      fx_s, fu_s, gx_s, gu_s, gxx_s, guu_s, gux_s,
                      obuf, sems, osems):
    """Streamed-output variant of ``_kernel_mr`` for dims whose full-horizon
    output blocks do not fit VMEM (e.g. quadrotor n=12, m=4: inputs alone are
    3.4MB per chunk step and direct [Tp,...] output blocks are ~13MB against
    the 16MB scoped-VMEM limit).  Per chunk, K/k/Qx/Qu/p rows are packed into
    a double-buffered VMEM chunk buffer ``obuf [2, chunk, Fo, sub, 128]``
    (Fo = m*n + 2m + 2n) and DMA'd to the packed HBM output ``out_hbm
    [Tp, Fo, S_all, 128]``; the caller slices the five arrays out at the XLA
    level."""
    i = pl.program_id(0)
    row0 = pl.multiple_of(i * sub, sub)
    nchunks = Tp // chunk
    hbms = [fx_hbm, fu_hbm, gx_hbm, gu_hbm, gxx_hbm, guu_hbm, gux_hbm]
    bufs = [fx_s, fu_s, gx_s, gu_s, gxx_s, guu_s, gux_s]

    def dma(slot, c, kk):
        h, b = hbms[kk], bufs[kk]
        mid = h.ndim - 3
        idx = (
            (pl.ds(c * chunk, chunk),)
            + (slice(None),) * mid
            + (pl.ds(row0, sub), slice(None))
        )
        return pltpu.make_async_copy(h.at[idx], b.at[slot], sems.at[slot, kk])

    def out_dma(slot, c):
        return pltpu.make_async_copy(
            obuf.at[slot],
            out_hbm.at[
                pl.ds(c * chunk, chunk), slice(None), pl.ds(row0, sub),
                slice(None),
            ],
            osems.at[slot],
        )

    def start_all(slot, c):
        for kk in range(7):
            dma(slot, c, kk).start()

    def wait_all(slot, c):
        for kk in range(7):
            dma(slot, c, kk).wait()

    start_all(0, nchunks - 1)

    reg = reg_ref[0]
    P0 = gxxT_ref[:]
    p0 = gxT_ref[:]
    ok0 = jnp.ones_like(reg)
    o_k = m * n
    o_qx = o_k + m
    o_qu = o_qx + n
    o_p = o_qu + m

    def chunk_body(ci, carry):
        P, p, ok = carry
        c = nchunks - 1 - ci
        slot = ci % 2

        @pl.when(ci + 1 < nchunks)
        def _():
            start_all(1 - slot, c - 1)

        # the output buffer slot was dispatched two chunks ago (c + 2)
        @pl.when(ci >= 2)
        def _():
            out_dma(slot, c + 2).wait()

        wait_all(slot, c)

        for j in range(chunk - 1, -1, -1):
            K, kff, Qx, Qu, P, p, ok = _riccati_step(
                n, m, reg, P, p, ok,
                fx_s[slot, j], fu_s[slot, j], gx_s[slot, j], gu_s[slot, j],
                gxx_s[slot, j], guu_s[slot, j], gux_s[slot, j],
            )
            S, Lw = kff.shape[-2], kff.shape[-1]
            obuf[slot, j, 0:o_k] = K.reshape(m * n, S, Lw)
            obuf[slot, j, o_k:o_qx] = kff
            obuf[slot, j, o_qx:o_qu] = Qx
            obuf[slot, j, o_qu:o_p] = Qu
            obuf[slot, j, o_p:] = p
        out_dma(slot, c).start()
        return (P, p, ok)

    _, _, ok = jax.lax.fori_loop(0, nchunks, chunk_body, (P0, p0, ok0))
    ok_ref[0] = ok
    # drain the last (up to) two in-flight output DMAs
    out_dma((nchunks - 1) % 2, 0).wait()

    @pl.when(nchunks >= 2)
    def _():
        out_dma((nchunks - 2) % 2, 1).wait()


_VMEM_BUDGET = 12 << 20  # conservative against the 16MB scoped-VMEM limit


def _auto_chunk(n, m, sub=DEFAULT_BLOCK_B // 128):
    """Largest chunk (<= DEFAULT_CHUNK) whose double-buffered input scratch
    stays within ~1/3 of the VMEM budget — problem dims scale the per-step
    packed row as F ~ 2n^2 + 2nm + m^2 (quadrotor n=12, m=4 is 9x acrobot)."""
    *_, F = _offsets(n, m)
    per = 2 * F * sub * 128 * 4
    return int(max(1, min(DEFAULT_CHUNK, (_VMEM_BUDGET // 3) // per)))


def _stream_outputs(n, m, Tp, chunk, sub=DEFAULT_BLOCK_B // 128):
    """True when the direct [Tp, ...] VMEM output blocks would overflow the
    budget and per-chunk output streaming must be used instead."""
    *_, F = _offsets(n, m)
    fo = m * n + 2 * m + 2 * n
    direct = (2 * chunk * F + Tp * fo) * sub * 128 * 4
    return direct > _VMEM_BUDGET


def pad_stacks_sl(fx, fu, gx, gu, gxx, guu, gux, u_mask, chunk=None):
    """Tile-aligned [Tm1/T, *dims, S, 128] stacks -> horizon-padded + guu
    fixup, ready for ``backward_pass_multiref``.  gx/gxx include the terminal
    row; returns (stacks_Tm1..., gxxT, gxT, meta).  ``chunk=None`` sizes the
    DMA chunk from the problem dims (must match the kernel's)."""
    Tm1, n = fx.shape[0], fx.shape[1]
    m = fu.shape[2]
    if chunk is None:
        chunk = _auto_chunk(n, m)
    S_all, Lw = fx.shape[-2], fx.shape[-1]
    dtype = fx.dtype
    Tp = _round_up(Tm1, chunk)

    um = u_mask.astype(dtype)                                   # [Tm1, m]
    guu = guu + (jnp.eye(m, dtype=dtype)[None] * (1.0 - um)[:, None, :])[
        ..., None, None
    ]

    def padT(a, fill_eye=False):
        if Tp == Tm1:
            return a
        if fill_eye:
            d = a.shape[1]
            pad = jnp.broadcast_to(
                jnp.eye(d, dtype=dtype)[None, :, :, None, None],
                (Tp - Tm1,) + a.shape[1:],
            )
        else:
            pad = jnp.zeros((Tp - Tm1,) + a.shape[1:], dtype)
        return jnp.concatenate([a, pad], axis=0)

    out = (
        padT(fx, fill_eye=True),
        padT(fu),
        padT(gx[:-1]),
        padT(gu),
        padT(gxx[:-1]),
        padT(guu, fill_eye=True),
        padT(gux),
    )
    meta = dict(
        B=S_all * Lw, Bp=S_all * Lw, Tm1=Tm1, Tp=Tp, n=n, m=m, S_all=S_all
    )
    return out + (gxx[-1], gx[-1], meta)


def backward_pass_multiref(stacks, gxxT, gxT, reg_sl, meta,
                           block_b=DEFAULT_BLOCK_B, chunk=None,
                           interpret: bool = False):
    """v4 entry: ``stacks`` = (fx, fu, gx, gu, gxx, guu, gux) each
    [Tp, *dims, S_all, 128] (from ``pad_stacks_sl``); ``reg_sl`` is
    [S_all, 128].  Returns batch-trailing outputs like backward_pass_packed.

    ``chunk=None`` sizes the DMA chunk from the problem dims (matching
    ``pad_stacks_sl``); when the direct full-horizon VMEM output blocks
    would overflow the scoped-VMEM budget (large nx/nu), the streamed-output
    kernel variant is used instead.
    """
    Tm1, Tp = meta["Tm1"], meta["Tp"]
    n, m, S_all = meta["n"], meta["m"], meta["S_all"]
    dtype = stacks[0].dtype
    sub = block_b // 128
    if chunk is None:
        chunk = _auto_chunk(n, m, sub)
    assert Tp % chunk == 0, (Tp, chunk)
    Bp = S_all * 128
    assert Bp % block_b == 0, (Bp, block_b)
    grid = (Bp // block_b,)

    def vspec(*dims):
        nd = len(dims)
        return pl.BlockSpec(
            dims + (sub, 128),
            (lambda i, _nd=nd: (0,) * _nd + (i, 0)),
            memory_space=pltpu.VMEM,
        )

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 7 + [
        vspec(n, n), vspec(n), vspec(1),
    ]
    scratch = [
        pltpu.VMEM((2, chunk, n, n, sub, 128), dtype),   # fx
        pltpu.VMEM((2, chunk, n, m, sub, 128), dtype),   # fu
        pltpu.VMEM((2, chunk, n, sub, 128), dtype),      # gx
        pltpu.VMEM((2, chunk, m, sub, 128), dtype),      # gu
        pltpu.VMEM((2, chunk, n, n, sub, 128), dtype),   # gxx
        pltpu.VMEM((2, chunk, m, m, sub, 128), dtype),   # guu
        pltpu.VMEM((2, chunk, m, n, sub, 128), dtype),   # gux
    ]

    if _stream_outputs(n, m, Tp, chunk, sub):
        fo = m * n + 2 * m + 2 * n
        out_shape = (
            jax.ShapeDtypeStruct((Tp, fo, S_all, 128), dtype),
            jax.ShapeDtypeStruct((1, S_all, 128), dtype),
        )
        out_specs = (pl.BlockSpec(memory_space=pl.ANY), vspec(1))
        kernel = functools.partial(_kernel_mr_stream, n, m, Tp, chunk, sub)
        packed_out, ok_t = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch + [
                pltpu.VMEM((2, chunk, fo, sub, 128), dtype),   # obuf
                pltpu.SemaphoreType.DMA((2, 7)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(*stacks, gxxT, gxT, reg_sl[None])
        o_k = m * n
        po = packed_out[:Tm1]
        K_t = po[:, :o_k].reshape(Tm1, m, n, S_all, 128)
        k_t = po[:, o_k : o_k + m]
        Qx_t = po[:, o_k + m : o_k + m + n]
        Qu_t = po[:, o_k + m + n : o_k + 2 * m + n]
        p_t = po[:, o_k + 2 * m + n :]
        return K_t, k_t, Qx_t, Qu_t, p_t, ok_t[0]

    out_shape = (
        jax.ShapeDtypeStruct((Tp, m, n, S_all, 128), dtype),
        jax.ShapeDtypeStruct((Tp, m, S_all, 128), dtype),
        jax.ShapeDtypeStruct((Tp, n, S_all, 128), dtype),
        jax.ShapeDtypeStruct((Tp, m, S_all, 128), dtype),
        jax.ShapeDtypeStruct((Tp, n, S_all, 128), dtype),
        jax.ShapeDtypeStruct((1, S_all, 128), dtype),
    )
    out_specs = (
        vspec(Tp, m, n), vspec(Tp, m), vspec(Tp, n), vspec(Tp, m),
        vspec(Tp, n), vspec(1),
    )
    kernel = functools.partial(_kernel_mr, n, m, Tp, chunk, sub)
    K_t, k_t, Qx_t, Qu_t, p_t, ok_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch + [pltpu.SemaphoreType.DMA((2, 7))],
        interpret=interpret,
    )(*stacks, gxxT, gxT, reg_sl[None])
    return (
        K_t[:Tm1], k_t[:Tm1], Qx_t[:Tm1], Qu_t[:Tm1], p_t[:Tm1], ok_t[0]
    )
