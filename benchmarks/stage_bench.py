"""Per-stage microbenchmarks (TPU analog of reference test/benchmark.jl).

Times each solver stage in isolation at a given (B, T) on the current
backend: objective/constraint evaluation, derivative stacks + AL augmentation,
backward pass (scan and associative variants), closed-loop rollout, and the
full parallel-alpha line search.  Prints one JSON line per stage.

Usage: python benchmarks/stage_bench.py [--batch 4096] [--horizon 101] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp


def timeit(fn, args, reps=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--horizon", type=int, default=101)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument(
        "--roofline", action="store_true",
        help="add XLA cost_analysis (bytes accessed / flops) per stage and "
        "the HBM-bandwidth-bound time; also times one full SL solver body "
        "iteration (the production per-iteration program)",
    )
    ap.add_argument(
        "--hbm-gbps", type=float, default=819.0,
        help="HBM bandwidth for the bound (GB/s; v5e ~819)",
    )
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from iterativelqr_tpu.utils.compile_cache import setup_compile_cache

    setup_compile_cache("cpu" if args.cpu else jax.default_backend())

    from iterativelqr_tpu import Options
    from iterativelqr_tpu.core.spec import build_spec
    from iterativelqr_tpu.models import acrobot
    from iterativelqr_tpu.ops import al as al_ops
    from iterativelqr_tpu.ops import derivatives as dv
    from iterativelqr_tpu.ops.assoc import backward_pass_associative
    from iterativelqr_tpu.ops.backward import backward_pass_scan
    from iterativelqr_tpu.ops.forward import line_search
    from iterativelqr_tpu.ops.rollout import closed_loop_rollout

    B, T = args.batch, args.horizon
    dynamics, objective, constraints, x1, xT = acrobot.problem(T)
    spec = build_spec(dynamics, objective, constraints)
    opts = Options(verbose=False, record_traces=False)
    dtype = jnp.float32
    nx, nu, nc = spec.nx, spec.nu, spec.nc
    ineq = jnp.asarray(spec.ineq_mask)
    u_mask = jnp.asarray(spec.u_mask)

    key = jax.random.PRNGKey(0)
    xs = 0.1 * jax.random.normal(key, (B, T, nx), dtype)
    us = 0.05 * jnp.ones((B, T - 1, nu), dtype)
    ws = jnp.zeros((B, T, max(spec.npar, 0)), dtype)
    duals = jnp.zeros((B, T, nc), dtype)
    penalty = jnp.ones((B, T, nc), dtype)

    prec = jax.default_matmul_precision

    @jax.jit
    def stage_objective(xs, us, ws, duals, penalty):
        with prec("float32"):
            def one(xs, us, ws, duals, penalty):
                J = dv.total_cost(spec, xs, us, ws)
                c = dv.constraint_values(spec, xs, us, ws)
                return J + al_ops.al_terms(c, duals, penalty, ineq), c
            return jax.vmap(one)(xs, us, ws, duals, penalty)

    @jax.jit
    def stage_derive(xs, us, ws, duals, penalty):
        with prec("float32"):
            def one(xs, us, ws, duals, penalty):
                fx, fu = dv.dynamics_jacobians(spec, xs, us, ws)
                gx, gu = dv.cost_gradients(spec, xs, us, ws)
                gxx, guu, gux = dv.cost_hessians(spec, xs, us, ws)
                c = dv.constraint_values(spec, xs, us, ws)
                cx, cu = dv.constraint_jacobians(spec, xs, us, ws)
                dgx, dgu, dgxx, dguu, dgux = al_ops.al_gradient_terms(
                    c, cx, cu, duals, penalty, ineq
                )
                return fx, fu, gx + dgx, gu + dgu, gxx + dgxx, guu + dguu, gux + dgux
            return jax.vmap(one)(xs, us, ws, duals, penalty)

    stacks = stage_derive(xs, us, ws, duals, penalty)
    jax.block_until_ready(stacks)
    fx, fu, gx, gu, gxx, guu, gux = stacks
    reg = jnp.zeros((), dtype)

    @jax.jit
    def stage_backward_scan(fx, fu, gx, gu, gxx, guu, gux):
        with prec("float32"):
            return jax.vmap(
                lambda *a: backward_pass_scan(*a, u_mask, reg, unroll=opts.scan_unroll)
            )(fx, fu, gx, gu, gxx, guu, gux)

    @jax.jit
    def stage_backward_assoc(fx, fu, gx, gu, gxx, guu, gux):
        with prec("float32"):
            return jax.vmap(
                lambda *a: backward_pass_associative(*a, u_mask, reg)
            )(fx, fu, gx, gu, gxx, guu, gux)

    K, kff, Qx, Qu, p, ok = stage_backward_scan(fx, fu, gx, gu, gxx, guu, gux)
    jax.block_until_ready(K)

    @jax.jit
    def stage_rollout(xs, us, ws, K, kff):
        with prec("float32"):
            return jax.vmap(
                lambda xs, us, ws, K, kff: closed_loop_rollout(
                    spec, xs, us, ws, K, kff, 0.5, unroll=opts.scan_unroll
                )
            )(xs, us, ws, K, kff)

    def make_line_search(local_opts):
        @jax.jit
        def stage_line_search(xs, us, ws, K, kff, duals, penalty):
            with prec("float32"):
                def one(xs, us, ws, K, kff, duals, penalty):
                    def obj_fn(xs_, us_):
                        J = dv.total_cost(spec, xs_, us_, ws)
                        c = dv.constraint_values(spec, xs_, us_, ws)
                        return J + al_ops.al_terms(c, duals, penalty, ineq), c
                    J0, c0 = obj_fn(xs, us)
                    return line_search(
                        spec, obj_fn, xs, us, ws, K, kff,
                        jnp.asarray(-1.0, xs.dtype), J0, c0, local_opts,
                        duals=duals, penalty=penalty,
                    )
                return jax.vmap(one)(xs, us, ws, K, kff, duals, penalty)
        return stage_line_search

    import dataclasses as _dc

    stages = {
        "objective_eval": (stage_objective, (xs, us, ws, duals, penalty)),
        "derivatives_al": (stage_derive, (xs, us, ws, duals, penalty)),
        "backward_scan": (stage_backward_scan, (fx, fu, gx, gu, gxx, guu, gux)),
        "backward_assoc": (stage_backward_assoc, (fx, fu, gx, gu, gxx, guu, gux)),
        "rollout": (stage_rollout, (xs, us, ws, K, kff)),
        "line_search_full": (
            make_line_search(opts), (xs, us, ws, K, kff, duals, penalty)
        ),
        "line_search_8alpha": (
            make_line_search(_dc.replace(opts, min_step_size=4.0e-3)),
            (xs, us, ws, K, kff, duals, penalty),
        ),
        "line_search_unroll8": (
            make_line_search(_dc.replace(opts, scan_unroll=8)),
            (xs, us, ws, K, kff, duals, penalty),
        ),
    }
    # SL-layout stages — the production batched TPU path (core/solve_sl.py):
    # everything [T, *dims, S, 128] with the batch on the tile axes
    if B % 1024 == 0:
        from iterativelqr_tpu.ops.packed_pipeline import make_derive_backward_sl
        from iterativelqr_tpu.ops.sl_ops import SLOps, to_sl

        S = B // 128
        interp = jax.default_backend() != "tpu"
        sl_ops = SLOps(spec, opts)
        derive_sl = make_derive_backward_sl(spec, opts, interpret=interp)
        xs_sl, us_sl, ws_sl = to_sl(xs, S), to_sl(us, S), to_sl(ws, S)
        duals_sl = to_sl(duals, S)
        pen_sl = to_sl(penalty, S)
        reg_sl = jnp.zeros((S, 128), dtype)

        @jax.jit
        def stage_sl_objective(xs_sl, us_sl, ws_sl, duals_sl, pen_sl):
            with prec("float32"):
                return sl_ops.al_objective(xs_sl, us_sl, ws_sl, duals_sl, pen_sl)

        J_sl, c_sl = stage_sl_objective(xs_sl, us_sl, ws_sl, duals_sl, pen_sl)
        jax.block_until_ready(c_sl)

        @jax.jit
        def stage_sl_derive_backward(xs_sl, us_sl, ws_sl, duals_sl, pen_sl,
                                     c_sl, reg_sl):
            with prec("float32"):
                return derive_sl(
                    xs_sl, us_sl, ws_sl, duals_sl, pen_sl, c_sl, reg_sl
                )

        K_sl, k_sl, slope_sl, grad_sl, _ = stage_sl_derive_backward(
            xs_sl, us_sl, ws_sl, duals_sl, pen_sl, c_sl, reg_sl
        )
        jax.block_until_ready(K_sl)

        def make_sl_ls(local_opts):
            lops = SLOps(spec, local_opts)

            @jax.jit
            def stage_sl_line_search(xs_sl, us_sl, ws_sl, K_sl, k_sl,
                                     slope_sl, J_sl, c_sl, duals_sl, pen_sl):
                with prec("float32"):
                    return lops.line_search(
                        xs_sl, us_sl, ws_sl, K_sl, k_sl, slope_sl, J_sl,
                        c_sl, duals_sl, pen_sl,
                    )

            return stage_sl_line_search

        ls_args = (xs_sl, us_sl, ws_sl, K_sl, k_sl, slope_sl, J_sl, c_sl,
                   duals_sl, pen_sl)
        stages.update({
            "sl_objective_eval": (
                stage_sl_objective, (xs_sl, us_sl, ws_sl, duals_sl, pen_sl)
            ),
            "sl_derive_backward_slope": (
                stage_sl_derive_backward,
                (xs_sl, us_sl, ws_sl, duals_sl, pen_sl, c_sl, reg_sl),
            ),
            # forward_kernel="auto" (the default) picks the pallas rollout
            # kernels on TPU; the explicit "scan" variant isolates their win
            "sl_line_search_full": (make_sl_ls(opts), ls_args),
            "sl_line_search_full_scan": (
                make_sl_ls(_dc.replace(opts, forward_kernel="scan")), ls_args
            ),
            "sl_line_search_8alpha": (
                make_sl_ls(_dc.replace(opts, min_step_size=4.0e-3)), ls_args
            ),
            "sl_line_search_8alpha_scan": (
                make_sl_ls(_dc.replace(opts, min_step_size=4.0e-3,
                                       forward_kernel="scan")), ls_args
            ),
        })

    if args.roofline and B % 1024 == 0:
        # one full SL solver body iteration — the program the production
        # batched solve dispatches per iteration (core/solve_sl.py); its
        # measured time x mean iterations is the whole-solve wall clock
        # (minus compaction/host overhead), and its bytes-accessed / HBM
        # bandwidth is the speed-of-light bound for the solve
        from iterativelqr_tpu.core.solve_sl import make_sl_parts

        parts = make_sl_parts(
            spec, _dc.replace(opts, backward_pass="packed",
                              batched_solver="sl"),
            interpret=jax.default_backend() != "tpu",
        )
        carry0, ws_sl_full = jax.jit(parts.init)(xs, us, ws)
        jax.block_until_ready(carry0.J)
        body_fn = jax.jit(lambda s, w: parts.body(w)(s))
        stages["sl_body_full_iteration"] = (body_fn, (carry0, ws_sl_full))

    def cost_analysis(fn, a):
        """XLA's own program cost model: bytes accessed (HBM traffic as the
        compiler scheduled it) and flops.  Pallas custom calls are opaque to
        it — their DMA traffic is undercounted; treat kernel-stage bounds as
        lower bounds."""
        try:
            an = fn.lower(*a).compile().cost_analysis()
            if isinstance(an, (list, tuple)):
                an = an[0]
            return float(an.get("bytes accessed", 0.0)), float(
                an.get("flops", 0.0)
            )
        except Exception:
            return None, None

    for name, (fn, a) in stages.items():
        try:
            dt = timeit(fn, a, reps=args.reps)
            row = {
                "stage": name, "ms": round(dt * 1e3, 3), "batch": B,
                "horizon": T, "backend": jax.default_backend(),
                "us_per_instance": round(dt / B * 1e6, 3),
            }
            if args.roofline:
                bytes_acc, flops = cost_analysis(fn, a)
                if bytes_acc is not None:
                    bound_ms = bytes_acc / (args.hbm_gbps * 1e9) * 1e3
                    row.update({
                        "bytes_accessed": int(bytes_acc),
                        "flops": int(flops),
                        "hbm_bound_ms": round(bound_ms, 4),
                        "pct_of_bound": round(
                            100.0 * bound_ms / (dt * 1e3), 1
                        ) if dt > 0 else None,
                    })
            print(json.dumps(row), flush=True)
        except Exception as e:  # keep going; report the failure
            print(json.dumps({"stage": name, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
