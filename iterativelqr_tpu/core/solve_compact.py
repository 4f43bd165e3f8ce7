"""Straggler-compaction driver for the batched SL solve.

A batched ``lax.while_loop`` runs until the SLOWEST instance converges, so
wall clock is set by the iteration-count TAIL, not the mean.  Measured on
the acrobot T=101 B=4096 parity bench (benchmarks/tail_analysis.py): mean 72
iterations, p90 102, max 216 — and the live fraction collapses to 13.7% by
iteration 96 and 2% by 128.  Running the last ~120 iterations at B=4096 for
~500 live instances wastes ~3x of the total wall clock.

This driver runs the SL solver (core/solve_sl.py) in bounded CHUNKS of
iterations and, between chunks, COMPACTS the still-live instances into a
smaller batch shape when they fit in a fraction of the current one:

    carry = init(xs, us, ws)                       # full batch  B0
    while live:
        carry = chunk(carry)                        # <= K iterations
        if ceil1024(n_live) <= B_cur / shrink:      # worth re-packing
            scatter carry back into the full-batch carry
            gather live lanes (+ frozen fillers) into the smaller shape
    scatter; solution = finish(full carry)          # one pass, full batch

Per-instance semantics are EXACTLY those of the single-shot SL solver: each
lane's update sequence is independent (converged lanes are frozen by the
``live`` mask in the body), so chunk boundaries and lane moves change
nothing but wall clock; tests/test_solve_compact.py asserts bitwise-equal
Solutions on CPU.

This is a HOST-side loop (a few device syncs of one [S,128] bool per chunk)
— the returned callable is not jittable end-to-end.  Each distinct batch
shape is a separate compiled program; with ``cache_dir`` set, every program
is served from the jax.export program cache (utils/program_cache.py), so
the tunneled-backend lowering tax is paid once per shape ever.

Reference analog: none (the reference solves one instance at a time); this
is TPU-native batch-scheduling machinery.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from .options import Options
from .solve import Solution
from .solve_sl import make_sl_parts, _SLCarry
from .spec import ProblemSpec

_GRAIN = 1024  # packed kernel batch granularity (ops/packed_backward.py)


def _round_up(x, mult):
    return -(-x // mult) * mult


def make_compacted_solve_fn(
    spec: ProblemSpec,
    options: Options = Options(),
    *,
    chunk: int = 32,
    shrink: int = 2,
    interpret: bool = False,
    cache_dir: str | None = None,
    cache_key: str | None = None,
    dual_warm_start: bool = False,
    rescue: bool = True,
):
    """Build a host-callable ``(xs [B,T,nx], us, ws) -> Solution``.

    ``chunk``: iterations per device dispatch (tail granularity).
    ``shrink``: only re-pack when the live set fits in ``B_cur / shrink``.
    ``cache_dir``/``cache_key``: serve each per-shape program from the
    jax.export program cache under this key prefix.
    ``dual_warm_start``: the callable takes two extra batch-leading arrays
    ``(duals0 [B,T,nc], penalty0 [B,T,nc])``.
    ``rescue``: with ``early_round_iteration_cap`` set, any instance that
    exits infeasible under the truncated schedule is RE-SOLVED from its
    original inputs at the exact uncapped schedule (in one small
    grain-sized batch) and its Solution rows replaced — so the capped
    driver's solved set is always a superset of the uncapped solver's.
    The rescue programs are built lazily (first failure) and only exist
    when a cap is configured; a rescue re-solve costs one extra dispatch
    of a _GRAIN-sized batch, paid only on the rare capped-schedule miss.

    Exit-diagnostics caveat (for warm-start consumers): trajectories,
    iterates, duals, and violations are bitwise-identical to the
    single-shot SL solver, but ``Solution.K``/``k``/``grad_norm`` come
    from a separately-jitted finish program whose Cholesky-retry decision
    can flip on PD-marginal instances — measured <0.5% of instances
    differ (tests/test_solve_compact.py).  Re-derive gains from the
    returned trajectories if exact agreement with the single-shot
    solver's gains matters.
    """
    parts = make_sl_parts(
        spec, options, interpret=interpret, dual_warm_start=dual_warm_start
    )
    rescue_parts = None
    if rescue and options.early_round_iteration_cap is not None:
        rescue_parts = make_sl_parts(
            spec,
            dataclasses.replace(options, early_round_iteration_cap=None),
            interpret=interpret, dual_warm_start=dual_warm_start,
        )

    def _mk_chunk_host(p):
        def _chunk_host(carry, ws, n_iters):
            # n_iters is TRACED (one compiled program per batch shape serves
            # any dispatch size — the driver grows dispatches after
            # compaction to cut host-sync round trips, which cost ~10-30ms
            # each through the tunneled backend)
            body = p.body(ws)

            def cond(st):
                i, s = st
                return (i < n_iters) & ~jnp.all(s.stop)

            def step(st):
                i, s = st
                return i + 1, body(s)

            _, s = jax.lax.while_loop(cond, step, (jnp.int32(0), carry))
            return s

        return _chunk_host

    _chunk_host = _mk_chunk_host(parts)

    def _gather_host(carry, ws, idx):
        # idx [B'] int32 lane indices into the flattened (S,128) batch
        S2 = idx.shape[0] // 128

        def g(a):
            # explicit lane count: -1 breaks on zero-size dims (npar=0)
            flat = a.reshape(a.shape[:-2] + (a.shape[-2] * a.shape[-1],))
            out = jnp.take(flat, idx, axis=-1)
            return out.reshape(out.shape[:-1] + (S2, 128))

        return jax.tree.map(g, carry), jax.tree.map(g, ws)

    def _scatter_host(carry_full, carry_small, idx):
        def sc(af, asm):
            flatf = af.reshape(af.shape[:-2] + (af.shape[-2] * af.shape[-1],))
            flats = asm.reshape(
                asm.shape[:-2] + (asm.shape[-2] * asm.shape[-1],)
            )
            out = flatf.at[..., idx].set(flats)
            return out.reshape(af.shape)

        return jax.tree.map(sc, carry_full, carry_small)

    def _cached(make, tag, example_args):
        if cache_dir is None:
            fn = make()
            return jax.jit(fn)
        from ..utils.program_cache import cached_program

        key = f"{cache_key or 'compact'}_{tag}"
        return cached_program(make, key, example_args, cache_dir=cache_dir,
                              verbose=True)

    # per-shape program tables, shared across solve() calls (deserializing
    # a cached program per call would dominate the solve otherwise)
    init_fns, finish_fns = {}, {}
    chunk_fns, gather_fns, scatter_fns = {}, {}, {}
    rescue_fns = {}

    def _run_rescue(sol, failed, xs_b, us_b, ws_b, warm):
        # exact-schedule re-solve of the failed lanes, from their ORIGINAL
        # inputs: per-lane results are bitwise those of the uncapped
        # single-shot SL solver.  One dispatch: the while loop inside the
        # chunk program runs to all-stop under the uncapped worst-case
        # iteration bound.
        Br = max(_GRAIN, _round_up(failed.size, _GRAIN))
        sel = np.resize(failed, Br)  # tile to fill; replicas discarded
        ins = tuple(
            jnp.asarray(np.asarray(a)[sel]) for a in (xs_b, us_b, ws_b, *warm)
        )
        n_bound = jnp.int32(options.max_iterations * options.max_dual_updates)
        if Br not in rescue_fns:
            init_r = _cached(
                lambda: rescue_parts.init, f"rescue_init_B{Br}", ins
            )
            carry0, ws_r0 = init_r(*ins)
            chunk_r = _cached(
                lambda: _mk_chunk_host(rescue_parts), f"rescue_chunk_B{Br}",
                (carry0, ws_r0, n_bound),
            )
            # example args need only shapes/dtypes: the post-chunk carry is
            # the same pytree as the initial one
            finish_r = _cached(
                lambda: lambda c, w: rescue_parts.finish(c, w, Br),
                f"rescue_finish_B{Br}", (carry0, ws_r0),
            )
            rescue_fns[Br] = (init_r, chunk_r, finish_r)
        init_r, chunk_r, finish_r = rescue_fns[Br]
        carry_r, ws_r = init_r(*ins)
        sol_r = finish_r(chunk_r(carry_r, ws_r, n_bound), ws_r)

        def patch(a_full, a_small):
            a = np.array(a_full)
            a[failed] = np.asarray(a_small)[: failed.size]
            return jnp.asarray(a)

        return jax.tree.map(patch, sol, sol_r)

    def solve(xs_b, us_b, ws_b, *warm) -> Solution:
        B = int(xs_b.shape[0])
        if B not in init_fns:
            init_fns[B] = _cached(
                lambda: parts.init, f"init_B{B}", (xs_b, us_b, ws_b, *warm)
            )
        carry, ws_full = init_fns[B](xs_b, us_b, ws_b, *warm)
        Bp = carry.stop.shape[-2] * 128

        def run_chunk(carry, ws):
            Bc = carry.stop.shape[-2] * 128
            # grow dispatches at smaller shapes: the cheap post-compaction
            # phase should not pay one host round trip per `chunk` iterations
            n = jnp.int32(min(chunk * max(Bp // Bc, 1), 4 * chunk))
            if Bc not in chunk_fns:
                chunk_fns[Bc] = _cached(
                    lambda: _chunk_host, f"chunkv_B{Bc}", (carry, ws, n)
                )
            return chunk_fns[Bc](carry, ws, n)

        carry_full, ws_cur = carry, ws_full
        idx = None  # current-lane -> full-lane map; None = identity (full)
        while True:
            cur = carry if idx is not None else carry_full
            cur = run_chunk(cur, ws_cur)
            if idx is None:
                carry_full = cur
            else:
                carry = cur
            stop = np.asarray(cur.stop).ravel()
            if stop.all():
                break
            live = np.flatnonzero(~stop)
            B_cur = stop.size
            B_next = max(_GRAIN, _round_up(len(live), _GRAIN))
            if B_next * shrink > B_cur:
                continue
            # re-pack: live lanes + frozen (stopped) fillers to B_next
            fill = np.flatnonzero(stop)[: B_next - len(live)]
            sel = np.concatenate([live, fill]).astype(np.int32)
            if idx is not None:
                # fold current carry back into the full-batch carry first
                Bc = carry.stop.shape[-2] * 128
                key = (Bp, Bc)
                if key not in scatter_fns:
                    scatter_fns[key] = _cached(
                        lambda: _scatter_host, f"scatter_B{Bp}_b{Bc}",
                        (carry_full, carry, idx),
                    )
                carry_full = scatter_fns[key](carry_full, carry, idx)
                sel = np.asarray(idx)[sel]  # to full-lane coordinates
            key = (Bp, B_next)
            idx = jnp.asarray(sel, jnp.int32)
            if key not in gather_fns:
                gather_fns[key] = _cached(
                    lambda: _gather_host, f"gather_B{Bp}_b{B_next}",
                    (carry_full, ws_full, idx),
                )
            carry, ws_cur = gather_fns[key](carry_full, ws_full, idx)

        if idx is not None:
            Bc = carry.stop.shape[-2] * 128
            key = (Bp, Bc)
            if key not in scatter_fns:
                scatter_fns[key] = _cached(
                    lambda: _scatter_host, f"scatter_B{Bp}_b{Bc}",
                    (carry_full, carry, idx),
                )
            carry_full = scatter_fns[key](carry_full, carry, idx)

        if B not in finish_fns:
            finish_fns[B] = _cached(
                lambda: lambda c, w: parts.finish(c, w, B),
                f"finish_B{B}", (carry_full, ws_full),
            )
        sol = finish_fns[B](carry_full, ws_full)

        if rescue_parts is not None:
            viol = np.asarray(sol.max_violation)
            failed = np.flatnonzero(viol > options.constraint_tolerance)
            if failed.size:
                sol = _run_rescue(sol, failed, xs_b, us_b, ws_b, warm)
        return sol

    return solve
