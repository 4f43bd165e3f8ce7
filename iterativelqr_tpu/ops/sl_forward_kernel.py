"""Pallas TPU kernels: fused line-search rollout scans at SL layout.

The SL line search (ops/sl_ops.py) is a T-step sequential ``lax.scan`` of
tiny per-step work — closed-loop control, user cost/constraint/dynamics
eval, AL accumulation.  At B=4096 the XLA scan pays ~28us of loop-step issue
latency against <1us of compute: measured 5.12ms for the 17-candidate
two-block search vs a 0.59ms HBM bound (docs/design.md section 4 fact 6) —
latency-bound, exactly the structure already fixed once for the backward
Riccati recursion (ops/packed_backward.py: chunked double-buffered DMA,
41x).  This module applies the same treatment to the two forward scans:

* **scoring** (``make_score_rollout``): ``nb`` candidates ride a leading
  axis of the VMEM state carry; per-step inputs (xbar, ubar, ws, K, k,
  duals, penalty) stream HBM->VMEM in double-buffered chunks; the alphas are
  STATIC Python floats baked into the statically-unrolled candidate loop;
  the terminal AL stage is evaluated in-kernel, so one kernel launch returns
  the complete AL objective per candidate.
* **winner re-roll** (``make_winner_reroll``): one rollout at a per-lane
  runtime alpha [S,128] (a VMEM block input, like ``reg`` in the backward
  kernel), emitting xs/us/c as direct VMEM output blocks.

The last horizon chunk is handled with the zero-copy overlap trick: its DMA
reads the full-chunk window ending at Tm1 (re-fetching up to chunk-1 already
processed steps) and the unrolled compute covers only the valid tail — no
horizon padding, no input relayout: the kernels read the solver's live SL
arrays (xbar [T,nx,S,128], duals [T,nc,S,128], ...) directly.

User functions run inside the kernel exactly as on the scan path
(``sl_ops.map2``: vmap over the two trailing tile axes).  ``pallas_call``
forbids captured array constants, and user functions routinely close over
arrays (e.g. the acrobot goal state inside its terminal constraint), so each
function is ``jax.closure_convert``-ed at build time: the hoisted constants
become explicit kernel inputs, pre-broadcast to ``[*shape, S, 128]`` tiles
(tiny — one (sub,128) tile per constant element) and vmapped alongside
x/u/w, keeping every in-kernel operand 2D-tile-shaped.

Eligibility (``kernel_eligible``): stage-uniform dynamics/cost/constraint
dispatch and a stage-uniform inequality-mask row over t < T-1 — per-t
``lax.switch`` cannot trace inside the kernel's fori_loop (the step index is
dynamic).  All in-tree model families qualify (core/spec.py ``_group``
dedupes semantically-identical per-t stage objects).  Agreement with the
scan path is pinned by tests/test_sl_forward_kernel.py in interpreter mode.

Reference hot loop replaced: src/forward_pass.jl:28-54 + src/rollout.jl:22-30.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_B = 1024  # batch lanes per grid block (sub = 8 sublanes x 128 lanes)
_VMEM_BUDGET = 12 << 20  # conservative vs the 16MB scoped-VMEM limit


def _map2(fn):
    """vmap a function over the two trailing (sub, 128) axes of EVERY
    argument — identical tracing to ops/sl_ops.py::map2, so kernel-path
    user-function evaluation matches the scan path op for op."""
    return jax.vmap(
        jax.vmap(fn, in_axes=-1, out_axes=-1), in_axes=-1, out_axes=-1
    )


def kernel_eligible(spec) -> bool:
    """True when the rollout kernels can serve this spec: the per-step
    dispatch (dyn/cost/con stage type, ineq row) must be uniform over
    t < T-1 (it is baked statically into the kernel body)."""
    Tm1 = spec.T - 1
    if Tm1 < 1:
        return False
    if len(np.unique(spec.dyn_tidx)) != 1:
        return False
    if len(np.unique(spec.cost_tidx[:Tm1])) != 1:
        return False
    if len(np.unique(spec.con_tidx[:Tm1])) != 1:
        return False
    if spec.nc > 0 and not (spec.ineq_mask[:Tm1] == spec.ineq_mask[0]).all():
        return False
    return True


def _auto_chunk(nx, nu, npar, nc, Tm1, sub=BLOCK_B // 128):
    """Largest DMA chunk (<= 8) whose double-buffered input scratch stays
    within ~1/3 of the VMEM budget; also capped at Tm1 (the overlap trick
    requires chunk <= Tm1)."""
    per_step = nx + nu + npar + nu * nx + nu + 2 * nc  # floats per (sub,128)
    per = 2 * per_step * sub * 128 * 4
    return int(max(1, min(8, Tm1, (_VMEM_BUDGET // 3) // max(per, 1))))


def _reroll_fits_vmem(T, nx, nu, nc, chunk, npar, sub=BLOCK_B // 128):
    """True when the re-roll kernel's direct VMEM output blocks
    (xs [T,nx], us [T-1,nu], c [T,nc]) plus input scratch fit the budget."""
    per_step = nx + nu + npar + nu * nx + nu + 2 * nc
    in_bytes = 2 * chunk * per_step * sub * 128 * 4
    out_bytes = (T * nx + (T - 1) * nu + T * nc + 2) * sub * 128 * 4
    return in_bytes + out_bytes < _VMEM_BUDGET


def _dot_mulsum(a, b, dimension_numbers):
    """General ``dot_general`` as broadcast-multiply-reduce.  User functions
    routinely contain ``jnp.dot``/``@`` (e.g. quadratic costs x @ Q @ x);
    once map2-vmapped over the tile axes those become batched dot_generals
    whose Mosaic lowering rejects the dimension numbers ("expected integer
    value" on #tpu.dot_dimension_numbers) — and per docs/design.md §4 tiny
    matmuls should be mul/reduce on TPU anyway (ops/linalg_small.py)."""
    (lc, rc), (lb, rb) = dimension_numbers
    lc, rc, lb, rb = map(tuple, (lc, rc, lb, rb))
    afree = tuple(d for d in range(a.ndim) if d not in lc + lb)
    bfree = tuple(d for d in range(b.ndim) if d not in rc + rb)
    at = jnp.transpose(a, lb + afree + lc)
    bt = jnp.transpose(b, rb + bfree + rc)
    nb, na, nbf, ncon = len(lb), len(afree), len(bfree), len(lc)
    at = at.reshape(at.shape[: nb + na] + (1,) * nbf + at.shape[nb + na :])
    bt = bt.reshape(bt.shape[:nb] + (1,) * na + bt.shape[nb:])
    prod = at * bt
    if ncon == 0:
        return prod
    return jnp.sum(prod, axis=tuple(range(prod.ndim - ncon, prod.ndim)))


def _eval_jaxpr_no_dot(jaxpr, consts, *args):
    """eval_jaxpr that rewrites every dot_general to ``_dot_mulsum``,
    recursing through pjit/closed_call/custom_jvp sub-jaxprs.  Control-flow
    primitives are bound as-is (per-step user functions are straight-line
    code; a dot inside lax.cond/scan would surface as the same Mosaic
    parse error at compile time, not silent wrong answers)."""
    from jax import lax
    from jax.extend.core import Literal

    env = {}

    def read(a):
        return a.val if isinstance(a, Literal) else env[a]

    for v, c in zip(jaxpr.constvars, consts):
        env[v] = c
    for v, a in zip(jaxpr.invars, args):
        env[v] = a
    for eqn in jaxpr.eqns:
        invals = [read(a) for a in eqn.invars]
        sub = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
        if eqn.primitive is lax.dot_general_p:
            outs = [_dot_mulsum(
                invals[0], invals[1], eqn.params["dimension_numbers"]
            )]
        elif sub is not None and hasattr(sub, "jaxpr"):  # ClosedJaxpr
            outs = _eval_jaxpr_no_dot(sub.jaxpr, sub.consts, *invals)
        elif sub is not None and hasattr(sub, "eqns"):   # raw Jaxpr
            outs = _eval_jaxpr_no_dot(sub, (), *invals)
        else:
            outs = eqn.primitive.bind(*invals, **eqn.params)
            if not eqn.primitive.multiple_results:
                outs = [outs]
        for v, o in zip(eqn.outvars, outs):
            env[v] = o
    return [read(v) for v in jaxpr.outvars]


class _Fns:
    """Closure-converted, map2-vmapped stage functions + their hoisted
    constants (concrete arrays), built once per dtype."""

    def __init__(self, spec, dtype):
        nx, nu = spec.nx, spec.nu
        npar = max(spec.npar, 0)
        ex = (
            jnp.zeros((nx,), dtype),
            jnp.zeros((nu,), dtype),
            jnp.zeros((npar,), dtype),
        )

        def conv(fn):
            # hoist closed-over array constants (e.g. goal states inside
            # user constraints) into explicit arguments: pallas_call forbids
            # captured array consts, and jax.closure_convert misses these
            # (it returned [] for a jaxpr with an f64[4] constvar)
            closed = jax.make_jaxpr(fn)(*ex)
            jaxpr = closed.jaxpr
            consts = tuple(jnp.asarray(c) for c in closed.consts)

            def pure(x, u, w, *cs):
                out = _eval_jaxpr_no_dot(jaxpr, list(cs), x, u, w)
                return out[0]

            return _map2(pure), consts

        self.dyn, self.dyn_c = conv(spec.dyn_eval[int(spec.dyn_tidx[0])])
        self.cost, self.cost_c = conv(
            spec.cost_eval[int(spec.cost_tidx[0])]
        )
        self.cost_T, self.cost_T_c = conv(
            spec.cost_eval[int(spec.cost_tidx[-1])]
        )
        if spec.nc > 0:
            self.con, self.con_c = conv(
                spec.con_eval[int(spec.con_tidx[0])]
            )
            self.con_T, self.con_T_c = conv(
                spec.con_eval[int(spec.con_tidx[-1])]
            )
        else:
            self.con = self.con_T = None
            self.con_c = self.con_T_c = ()
        self.all_consts = (
            self.dyn_c + self.cost_c + self.cost_T_c
            + self.con_c + self.con_T_c
        )
        n = [len(self.dyn_c), len(self.cost_c), len(self.cost_T_c),
             len(self.con_c), len(self.con_T_c)]
        self.splits = np.cumsum([0] + n)

    def unpack(self, const_refs):
        """Split the flat per-block const tile list back per function."""
        s = self.splits
        vals = [r[:] for r in const_refs]
        return (
            vals[s[0]:s[1]], vals[s[1]:s[2]], vals[s[2]:s[3]],
            vals[s[3]:s[4]], vals[s[4]:s[5]],
        )


class _Cfg:
    """Static per-spec configuration baked into the kernel bodies."""

    def __init__(self, spec, options):
        Tm1 = spec.T - 1
        self.spec = spec
        self.nx, self.nu, self.nc = spec.nx, spec.nu, spec.nc
        self.npar = max(spec.npar, 0)
        self.T, self.Tm1 = spec.T, Tm1
        if self.nc > 0:
            self.iq = np.asarray(spec.ineq_mask[0], bool)       # [nc]
            self.iq_T = np.asarray(spec.ineq_mask[-1], bool)    # [nc]
        self.chunk = _auto_chunk(self.nx, self.nu, self.npar, self.nc, Tm1)
        self._fns = {}

    def fns(self, dtype) -> _Fns:
        key = np.dtype(dtype).name
        if key not in self._fns:
            self._fns[key] = _Fns(self.spec, dtype)
        return self._fns[key]

    def step_dims(self):
        """(name, per-step dims) for each streamed input, in argument
        order.  'T'-kind arrays carry a terminal row (the kernels read rows
        < Tm1 only); 'Tm1'-kind are exactly horizon-length."""
        d = [
            ("xb", (self.nx,)),
            ("ub", (self.nu,)),
            ("K", (self.nu, self.nx)),
            ("k", (self.nu,)),
        ]
        if self.npar > 0:
            d.insert(2, ("w", (self.npar,)))
        if self.nc > 0:
            d += [("lam", (self.nc,)), ("rho", (self.nc,))]
        return d


def _al_term(cfg, c_t, lam, rho, iq_np, dtype):
    """Sum_c [lam*c + 0.5*a*rho*c^2] with the inactive-inequality rule
    (a=0 iff ineq & c<0 & lam==0); the ineq mask is static per slot, so no
    mask constant is materialized (pallas forbids captured array consts)."""
    total = None
    for ci in range(cfg.nc):
        c_i, lam_i, rho_i = c_t[ci], lam[ci], rho[ci]
        quad = 0.5 * rho_i * c_i * c_i
        if bool(iq_np[ci]):
            inactive = (c_i < 0.0) & (lam_i == 0.0)
            quad = jnp.where(inactive, jnp.zeros_like(quad), quad)
        term = lam_i * c_i + quad
        total = term if total is None else total + term
    return total


def _make_dma(cfg, hbms, bufs, sems, row0, sub):
    def dma(slot, off, kk):
        h, b = hbms[kk], bufs[kk]
        mid = h.ndim - 3
        idx = (
            (pl.ds(off, cfg.chunk),)
            + (slice(None),) * mid
            + (pl.ds(row0, sub), slice(None))
        )
        return pltpu.make_async_copy(h.at[idx], b.at[slot], sems.at[slot, kk])

    def start_all(slot, off):
        for kk in range(len(hbms)):
            dma(slot, off, kk).start()

    def wait_all(slot, off):
        for kk in range(len(hbms)):
            dma(slot, off, kk).wait()

    return start_all, wait_all


def _read_step(cfg, bufs, names, slot, j):
    """One step's rows from buffer ``slot`` position ``j`` -> dict."""
    return {name: bufs[i][slot, j] for i, name in enumerate(names)}


def _ctrl(cfg, x, row, alpha):
    """Closed-loop control u = ub + K (x - xb) + alpha*k on SL blocks;
    broadcast-multiply-reduce (never dot_general — ops/linalg_small.py)."""
    dx = x - row["xb"]
    return (
        row["ub"]
        + jnp.sum(row["K"] * dx[None], axis=1)
        + alpha * row["k"]
    )


def _w_of(cfg, row, sub, dtype):
    if cfg.npar > 0:
        return row["w"]
    return jnp.zeros((0, sub, 128), dtype)


def _score_kernel(cfg, alphas, n_stream, n_const, *refs):
    """Scoring kernel body.  ``alphas``: static tuple of Python floats.

    refs layout: [n_stream HBM inputs] + [x0, (wT), (lamT, rhoT),
    n_const const tiles] VMEM inputs + [J_out] + [n_stream scratch bufs,
    sems]."""
    nb = len(alphas)
    names = [d[0] for d in cfg.step_dims()]
    hbms = list(refs[:n_stream])
    pos = n_stream
    x0_ref = refs[pos]; pos += 1
    if cfg.npar > 0:
        wT_ref = refs[pos]; pos += 1
    if cfg.nc > 0:
        lamT_ref = refs[pos]; rhoT_ref = refs[pos + 1]; pos += 2
    const_refs = refs[pos : pos + n_const]; pos += n_const
    J_ref = refs[pos]; pos += 1
    bufs = list(refs[pos : pos + n_stream])
    sems = refs[pos + n_stream]

    i = pl.program_id(0)
    sub = x0_ref.shape[-2]
    row0 = pl.multiple_of(i * sub, sub)
    dtype = x0_ref.dtype
    chunk, Tm1 = cfg.chunk, cfg.Tm1
    nfull = Tm1 // chunk
    rem = Tm1 - nfull * chunk
    nchunks = nfull + (1 if rem else 0)

    fns = cfg.fns(dtype)
    dyn_c, cost_c, cost_T_c, con_c, con_T_c = fns.unpack(const_refs)
    start_all, wait_all = _make_dma(cfg, hbms, bufs, sems, row0, sub)

    def off_of(c):
        # overlap trick: the last (partial) chunk's window ends at Tm1
        if rem == 0:
            return c * chunk
        return jnp.where(c == nchunks - 1, Tm1 - chunk, c * chunk)

    start_all(0, off_of(0))

    x0 = x0_ref[:]                                     # [nx, sub, 128]
    x_all = jnp.broadcast_to(x0[None], (nb,) + x0.shape)
    J_all = jnp.zeros((nb, sub, 128), dtype)

    def do_step(x_all, J_all, slot, j):
        row = _read_step(cfg, bufs, names, slot, j)
        w = _w_of(cfg, row, sub, dtype)
        xs_new, Js_new = [], []
        for a, alpha in enumerate(alphas):
            x = x_all[a]
            u = _ctrl(cfg, x, row, alpha)
            g = fns.cost(x, u, w, *cost_c)
            J = J_all[a] + g
            if cfg.nc > 0:
                c_t = fns.con(x, u, w, *con_c)
                J = J + _al_term(cfg, c_t, row["lam"], row["rho"],
                                 cfg.iq, dtype)
            xs_new.append(fns.dyn(x, u, w, *dyn_c))
            Js_new.append(J)
        return jnp.stack(xs_new), jnp.stack(Js_new)

    def chunk_body(ci, carry):
        x_all, J_all = carry
        slot = ci % 2

        @pl.when(ci + 1 < nchunks)
        def _():
            start_all(1 - slot, off_of(ci + 1))

        wait_all(slot, off_of(ci))
        for j in range(chunk):
            x_all, J_all = do_step(x_all, J_all, slot, j)
        return (x_all, J_all)

    x_all, J_all = jax.lax.fori_loop(
        0, nfull, chunk_body, (x_all, J_all)
    )
    if rem:
        slot = nfull % 2
        wait_all(slot, off_of(nfull))
        # the overlap window's first chunk-rem rows were already processed
        for j in range(chunk - rem, chunk):
            x_all, J_all = do_step(x_all, J_all, slot, j)

    # terminal AL stage in-kernel (u = 0)
    u0 = jnp.zeros((cfg.nu, sub, 128), dtype)
    wT = wT_ref[:] if cfg.npar > 0 else jnp.zeros((0, sub, 128), dtype)
    Js = []
    for a in range(len(alphas)):
        J = J_all[a] + fns.cost_T(x_all[a], u0, wT, *cost_T_c)
        if cfg.nc > 0:
            cT = fns.con_T(x_all[a], u0, wT, *con_T_c)
            J = J + _al_term(cfg, cT, lamT_ref[:], rhoT_ref[:],
                             cfg.iq_T, dtype)
        Js.append(J)
    J_ref[:] = jnp.stack(Js)


def _reroll_kernel(cfg, n_stream, n_const, *refs):
    """Winner re-roll kernel body: one rollout at per-lane runtime alpha,
    emitting xs/us/c (+ J) as direct VMEM output blocks."""
    names = [d[0] for d in cfg.step_dims()]
    hbms = list(refs[:n_stream])
    pos = n_stream
    x0_ref = refs[pos]; pos += 1
    alpha_ref = refs[pos]; pos += 1
    if cfg.npar > 0:
        wT_ref = refs[pos]; pos += 1
    if cfg.nc > 0:
        lamT_ref = refs[pos]; rhoT_ref = refs[pos + 1]; pos += 2
    const_refs = refs[pos : pos + n_const]; pos += n_const
    xs_ref = refs[pos]; us_ref = refs[pos + 1]; pos += 2
    if cfg.nc > 0:
        c_ref = refs[pos]; pos += 1
    J_ref = refs[pos]; pos += 1
    bufs = list(refs[pos : pos + n_stream])
    sems = refs[pos + n_stream]

    i = pl.program_id(0)
    sub = x0_ref.shape[-2]
    row0 = pl.multiple_of(i * sub, sub)
    dtype = x0_ref.dtype
    chunk, Tm1 = cfg.chunk, cfg.Tm1
    nfull = Tm1 // chunk
    rem = Tm1 - nfull * chunk
    nchunks = nfull + (1 if rem else 0)

    fns = cfg.fns(dtype)
    dyn_c, cost_c, cost_T_c, con_c, con_T_c = fns.unpack(const_refs)
    start_all, wait_all = _make_dma(cfg, hbms, bufs, sems, row0, sub)

    def off_of(c):
        if rem == 0:
            return c * chunk
        return jnp.where(c == nchunks - 1, Tm1 - chunk, c * chunk)

    start_all(0, off_of(0))

    alpha = alpha_ref[0]                               # [sub, 128]
    x = x0_ref[:]
    J = jnp.zeros((sub, 128), dtype)

    def do_step(x, J, slot, j, t):
        row = _read_step(cfg, bufs, names, slot, j)
        w = _w_of(cfg, row, sub, dtype)
        u = _ctrl(cfg, x, row, alpha[None])
        g = fns.cost(x, u, w, *cost_c)
        J = J + g
        if cfg.nc > 0:
            c_t = fns.con(x, u, w, *con_c)
            J = J + _al_term(cfg, c_t, row["lam"], row["rho"], cfg.iq, dtype)
            c_ref[t] = c_t
        xs_ref[t] = x
        us_ref[t] = u
        return fns.dyn(x, u, w, *dyn_c), J

    def chunk_body(ci, carry):
        x, J = carry
        slot = ci % 2

        @pl.when(ci + 1 < nchunks)
        def _():
            start_all(1 - slot, off_of(ci + 1))

        wait_all(slot, off_of(ci))
        for j in range(chunk):
            x, J = do_step(x, J, slot, j, ci * chunk + j)
        return (x, J)

    x, J = jax.lax.fori_loop(0, nfull, chunk_body, (x, J))
    if rem:
        slot = nfull % 2
        wait_all(slot, off_of(nfull))
        for j in range(chunk - rem, chunk):
            x, J = do_step(x, J, slot, j, Tm1 - chunk + j)

    u0 = jnp.zeros((cfg.nu, sub, 128), dtype)
    wT = wT_ref[:] if cfg.npar > 0 else jnp.zeros((0, sub, 128), dtype)
    J = J + fns.cost_T(x, u0, wT, *cost_T_c)
    if cfg.nc > 0:
        cT = fns.con_T(x, u0, wT, *con_T_c)
        J = J + _al_term(cfg, cT, lamT_ref[:], rhoT_ref[:], cfg.iq_T, dtype)
        c_ref[Tm1] = cT
    xs_ref[Tm1] = x
    J_ref[0] = J


def _vspec(sub, *dims):
    nd = len(dims)
    return pl.BlockSpec(
        dims + (sub, 128),
        (lambda i, _nd=nd: (0,) * _nd + (i, 0)),
        memory_space=pltpu.VMEM,
    )


def _stream_args(cfg, xbar, ubar, ws, K, k, duals, penalty):
    """HBM-streamed arrays in step_dims() order (full arrays — the kernels
    read only rows < Tm1, so no XLA slice copies are materialized)."""
    args = [xbar, ubar, K, k]
    if cfg.npar > 0:
        args.insert(2, ws)
    if cfg.nc > 0:
        args += [duals, penalty]
    return args


def _const_tiles(fns, S):
    """Hoisted user-function constants, pre-broadcast to [*shape, S, 128]
    tiles (vmapped alongside x/u/w inside the kernel, so every in-kernel
    operand is 2D-tile-shaped); plus their VMEM specs builder."""
    tiles = [
        jnp.broadcast_to(
            c[(...,) + (None, None)], c.shape + (S, 128)
        )
        for c in fns.all_consts
    ]
    return tiles


def _const_specs(fns, sub):
    return [_vspec(sub, *c.shape) for c in fns.all_consts]


def _scratch(cfg, dtype, sub):
    shapes = [
        pltpu.VMEM((2, cfg.chunk) + dims + (sub, 128), dtype)
        for _, dims in cfg.step_dims()
    ]
    n = len(shapes)
    return shapes + [pltpu.SemaphoreType.DMA((2, n))], n


def make_score_rollout(spec, options, alphas, interpret: bool = False):
    """Build ``(xbar, ubar, ws, K, k, duals, penalty) -> J [nb, S, 128]``:
    the complete AL objective of every candidate in ``alphas`` (static tuple
    of floats), one kernel launch.  All inputs are the solver's live SL
    arrays (xbar/ws/duals/penalty [T,*,S,128]; ubar/K/k [T-1,*,S,128])."""
    cfg = _Cfg(spec, options)
    alphas = tuple(float(a) for a in alphas)
    nb = len(alphas)

    def run(xbar, ubar, ws, K, k, duals, penalty):
        dtype = xbar.dtype
        S = xbar.shape[-2]
        Bp = S * 128
        block_b = min(BLOCK_B, Bp)
        sub = block_b // 128
        assert Bp % block_b == 0, (Bp, block_b)
        grid = (Bp // block_b,)
        fns = cfg.fns(dtype)

        stream = _stream_args(cfg, xbar, ubar, ws, K, k, duals, penalty)
        n_stream = len(stream)
        vmem_in = [xbar[0]]
        vmem_specs = [_vspec(sub, cfg.nx)]
        if cfg.npar > 0:
            vmem_in.append(ws[-1])
            vmem_specs.append(_vspec(sub, cfg.npar))
        if cfg.nc > 0:
            vmem_in += [duals[-1], penalty[-1]]
            vmem_specs += [_vspec(sub, cfg.nc), _vspec(sub, cfg.nc)]
        vmem_in += _const_tiles(fns, S)
        vmem_specs += _const_specs(fns, sub)

        scratch, _ = _scratch(cfg, dtype, sub)
        kernel = functools.partial(
            _score_kernel, cfg, alphas, n_stream, len(fns.all_consts)
        )
        J = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_stream
            + vmem_specs,
            out_specs=_vspec(sub, nb),
            out_shape=jax.ShapeDtypeStruct((nb, S, 128), dtype),
            scratch_shapes=scratch,
            interpret=interpret,
        )(*stream, *vmem_in)
        return J

    return run


def reroll_fits(spec, options) -> bool:
    cfg = _Cfg(spec, options)
    return _reroll_fits_vmem(cfg.T, cfg.nx, cfg.nu, cfg.nc, cfg.chunk,
                             cfg.npar)


def make_winner_reroll(spec, options, interpret: bool = False):
    """Build ``(alpha [S,128], xbar, ubar, ws, K, k, duals, penalty) ->
    (xs [T,nx,S,128], us [T-1,nu,S,128], J [S,128], c [T,nc,S,128])`` —
    the accepted-winner rollout at a per-lane step size, one kernel
    launch."""
    cfg = _Cfg(spec, options)

    def run(alpha, xbar, ubar, ws, K, k, duals, penalty):
        dtype = xbar.dtype
        S = xbar.shape[-2]
        Bp = S * 128
        block_b = min(BLOCK_B, Bp)
        sub = block_b // 128
        assert Bp % block_b == 0, (Bp, block_b)
        grid = (Bp // block_b,)
        fns = cfg.fns(dtype)

        stream = _stream_args(cfg, xbar, ubar, ws, K, k, duals, penalty)
        n_stream = len(stream)
        vmem_in = [xbar[0], alpha[None]]
        vmem_specs = [_vspec(sub, cfg.nx), _vspec(sub, 1)]
        if cfg.npar > 0:
            vmem_in.append(ws[-1])
            vmem_specs.append(_vspec(sub, cfg.npar))
        if cfg.nc > 0:
            vmem_in += [duals[-1], penalty[-1]]
            vmem_specs += [_vspec(sub, cfg.nc), _vspec(sub, cfg.nc)]
        vmem_in += _const_tiles(fns, S)
        vmem_specs += _const_specs(fns, sub)

        T, Tm1 = cfg.T, cfg.Tm1
        out_shape = [
            jax.ShapeDtypeStruct((T, cfg.nx, S, 128), dtype),    # xs
            jax.ShapeDtypeStruct((Tm1, cfg.nu, S, 128), dtype),  # us
        ]
        out_specs = [_vspec(sub, T, cfg.nx), _vspec(sub, Tm1, cfg.nu)]
        if cfg.nc > 0:
            out_shape.append(
                jax.ShapeDtypeStruct((T, cfg.nc, S, 128), dtype)
            )
            out_specs.append(_vspec(sub, T, cfg.nc))
        out_shape.append(jax.ShapeDtypeStruct((1, S, 128), dtype))  # J
        out_specs.append(_vspec(sub, 1))

        scratch, _ = _scratch(cfg, dtype, sub)
        kernel = functools.partial(
            _reroll_kernel, cfg, n_stream, len(fns.all_consts)
        )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_stream
            + vmem_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=scratch,
            interpret=interpret,
        )(*stream, *vmem_in)
        if cfg.nc > 0:
            xs, us, c, J = outs
        else:
            xs, us, J = outs
            c = jnp.zeros((T, 0, S, 128), dtype)
        return xs, us, J[0], c

    return run
