"""Headline benchmark: batched acrobot swing-up, T=101, solves/sec/chip.

Metric (BASELINE.json): iLQR solves/sec/chip at acrobot T=101, wall-clock to
constraint violation < tolerance.  The batch is CANONICAL_BATCH (8192)
perturbed initial conditions — BASELINE.json configs[3] names 4096; 8192 is
the measured chip-filling knee for both presets (see the CANONICAL_BATCH
note) — sharded over all local devices; every instance must actually
converge (solved fraction is checked and reported).

Baseline: the reference publishes no numbers and Julia is not in this image
(BASELINE.md), so ``vs_baseline`` is measured against the sequential
single-core NumPy implementation of the same algorithm
(benchmarks/numpy_reference.py) solving the same problem in float64 — the
honest stand-in for the reference's single-threaded CPU execution model.  The
baseline is measured once and cached in benchmarks/baseline_local.json.

A default (no-flag) run measures BOTH presets — "tuned" (hot AL schedule +
8-alpha grid) and "parity" (the library defaults, i.e. ``Options()``) — so
every driver capture carries a same-code-hash parity number (round-3 verdict
item 7).  Per-preset records are written to benchmarks/BENCH_tuned.json and
benchmarks/BENCH_parity.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} —
the headline value is the tuned preset; parity rides along as
``parity_value`` / ``parity_solved_fraction``.
"""

import argparse
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")

# Canonical protocol batch. Measured batch scaling at T=101 (2026-08-20,
# code_tag 17dde7cd7e, solves/s/chip, all solved_fraction 1.0):
#   tuned : B=4096 12.0-13.2k | B=8192 15,542 | B=16384 15,570 (flat)
#   parity: B=4096  6.6-7.5k  | B=8192  7,784 | B=16384  7,369 (declines)
# B=4096 underfills the chip for the tuned preset; 8192 is the knee for
# both. (The f32 divergence once seen at B=16384 no longer appears — the
# compaction driver's rescue pass absorbs it; solved fraction stays 1.0.)
CANONICAL_BATCH = 8192


def acquire_backend(max_attempts=5, probe_timeout=120, backoff=60, overall_cap=600):
    """Probe backend liveness in a subprocess before in-process jax init.

    ``jax.devices()`` through the tunneled TPU backend has been observed to
    hang ~20 minutes in PJRT client init and then die with UNAVAILABLE when
    the tunnel is down (round-2 bench loss).  In-process there is no way to
    bound that, so each probe runs ``jax.devices()`` in a subprocess with a
    hard timeout; on success the parent's own init is fast (tunnel verified
    live seconds ago).  Bounded retries with backoff, overall cap ~10 min.

    Returns the probed platform string on success, or ``None`` after the
    final failed attempt so the caller can emit one parseable JSON error
    line and exit quickly instead of hanging.
    """
    deadline = time.time() + overall_cap
    last_err = ""
    for attempt in range(1, max_attempts + 1):
        budget = min(probe_timeout, max(5, deadline - time.time()))
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); print(d[0].platform)"],
                capture_output=True, text=True, timeout=budget,
            )
            if out.returncode == 0 and out.stdout.strip():
                return out.stdout.strip().splitlines()[-1]
            last_err = (out.stderr or "").strip().splitlines()[-1:] or ["rc!=0"]
            last_err = last_err[0][-200:]
        except subprocess.TimeoutExpired:
            last_err = f"probe timed out after {budget:.0f}s"
        print(
            f"[bench] backend probe attempt {attempt}/{max_attempts} failed: "
            f"{last_err}", file=sys.stderr, flush=True,
        )
        if attempt == max_attempts or time.time() + backoff > deadline:
            break
        time.sleep(backoff)
    return None


def measure_baseline(T, cache_path):
    """Single-core NumPy solves/sec at acrobot T (cached)."""
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            data = json.load(f)
        if data.get("T") == T:
            return data["solves_per_sec"], data
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "benchmarks"))
    import numpy as np
    from numpy_reference import acrobot_problem, solve

    prob, x1, xT = acrobot_problem(T)
    us = 0.05 * np.ones((T - 1, prob.m))
    xs = np.zeros((T, prob.n))
    for t in range(T - 1):
        xs[t + 1] = prob.f(xs[t], us[t])
    # warm once (allocator/caches), then time
    solve(prob, xs, us)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        _, _, info = solve(prob, xs, us)
    dt = (time.perf_counter() - t0) / reps
    assert info["max_violation"] <= 5.0e-3, "baseline failed to converge"
    data = {
        "T": T,
        "solves_per_sec": 1.0 / dt,
        "seconds_per_solve": dt,
        "iterations": info["iterations"],
        "impl": "benchmarks/numpy_reference.py (sequential, float64, 1 core)",
    }
    with open(cache_path, "w") as f:
        json.dump(data, f, indent=1)
    return data["solves_per_sec"], data


def code_tag(pkg=None):
    """Hash of the package files that determine the benched program, so a
    code change can never silently serve a stale pre-lowered program (and
    the committed bench artifacts are auditable against HEAD).

    The hash is over each file's docstring-stripped AST, not its bytes:
    comments, whitespace, and docstrings cannot change the traced XLA
    program, and hashing them forced a full TPU bench re-run (the CLAUDE.md
    re-run rule, enforced by tests/test_bench_cache_fresh.py) for every
    doc-only touch of a core file — three same-day re-runs in round 5 alone.
    Caveat: ``ast.dump`` text is stable for a fixed interpreter but not
    guaranteed across Python minor versions — an interpreter upgrade may
    move the tag once (and a jax upgrade would warrant re-lowering the
    committed programs anyway).

    ``pkg``: override the package root (tests hash a scratch tree instead
    of mutating the real sources under xdist).
    """
    import ast
    import glob
    import hashlib

    if pkg is None:
        pkg = os.path.join(os.path.dirname(__file__), "iterativelqr_tpu")
    h = hashlib.sha256()
    roots = [
        os.path.join(pkg, "core"),
        os.path.join(pkg, "ops"),
        os.path.join(pkg, "parallel"),
        os.path.join(pkg, "models", "acrobot.py"),
    ]
    files = []
    for r in roots:
        if r.endswith(".py"):
            if os.path.exists(r):
                files.append(r)
        else:
            files.extend(glob.glob(os.path.join(r, "**", "*.py"), recursive=True))
    for f in sorted(files):
        with open(f, encoding="utf-8") as fh:
            tree = ast.parse(fh.read())
        for node in ast.walk(tree):
            body = getattr(node, "body", None)
            if (
                isinstance(body, list)
                and body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                node.body = body[1:] or [ast.Pass()]
        h.update(os.path.relpath(f, pkg).encode())
        h.update(ast.dump(tree).encode())
    return h.hexdigest()[:10]


def preset_options(preset, args):
    from iterativelqr_tpu import Options

    if preset == "tuned":
        # same tolerances/semantics as the reference defaults; hotter initial
        # penalty halves AL rounds (measured: inner iters 119 -> 61, all
        # instances still solve to 5e-3), pallas backward kernel on TPU
        opts = Options(
            verbose=False,
            record_traces=False,
            initial_constraint_penalty=1000.0,
            # 8-candidate alpha grid: identical convergence on this problem
            # (accepted steps never fall below 4e-3), ~4x cheaper line search
            min_step_size=4.0e-3,
            # inexact early AL rounds (cap sweep at HEAD 2026-08-20, B=8192,
            # same-session no-cap control 15,319: cap 32 -> 15,557, 24 ->
            # 15,905, 20 -> 16,639, 16 -> 16,449, 12 -> 16,596; all
            # solved_fraction 1.0, max-iteration tail 105 -> 86).  20 is the
            # knee's least-aggressive point; the progress gate +
            # consecutive-truncation limiter + compaction rescue make it
            # safe (Options docstrings, core/solve_compact.py)
            early_round_iteration_cap=20,
        )
    else:
        # parity preset IS the library default: backward_pass="auto" +
        # batched_solver="auto" select the packed/SL stack on TPU
        # (parallel/batch.py::_sl_eligible) and the scan/assoc regime rule
        # elsewhere — no hand-set performance knobs
        opts = Options(verbose=False, record_traces=False)
    fk = getattr(args, "fk", None)
    min_step = getattr(args, "min_step", None)
    penalty = getattr(args, "penalty", None)
    if (args.early_cap is not None or args.mct is not None or fk is not None
            or min_step is not None or penalty is not None):
        import dataclasses

        overrides = {}
        if min_step is not None:
            overrides["min_step_size"] = min_step
        if penalty is not None:
            overrides["initial_constraint_penalty"] = penalty
        if args.early_cap is not None:
            # 0 = the uncapped schedule (Options wants None, argparse can't
            # say it) — the no-cap control the tuned preset was swept
            # against; negatives are a typo, not a request for uncapped
            if args.early_cap < 0:
                raise SystemExit(
                    f"--early-cap {args.early_cap}: must be >= 1, or 0 for "
                    "the uncapped schedule"
                )
            overrides["early_round_iteration_cap"] = (
                args.early_cap if args.early_cap > 0 else None
            )
        if args.mct is not None:
            overrides["max_consecutive_truncations"] = args.mct
        if fk is not None:
            overrides["forward_kernel"] = fk
        opts = dataclasses.replace(opts, **overrides)
    return opts


def run_preset(args, preset, ctag):
    """Build, warm, integrity-check, and time one preset.  Returns the
    record dict (metric/value/... fields, baseline ratio added by main)."""
    import jax
    import jax.numpy as jnp

    from iterativelqr_tpu.core.spec import build_spec
    from iterativelqr_tpu.models import acrobot
    from iterativelqr_tpu.parallel import (
        batch_stats,
        default_mesh,
        make_batched_solve_fn,
        make_sharded_solve_fn,
        shard_batch,
    )
    from iterativelqr_tpu.utils.program_cache import cached_program

    T, B = args.horizon, args.batch
    # per-preset measured-best dispatch chunk (see --chunk help)
    chunk = args.chunk if args.chunk is not None else (
        48 if preset == "parity" else 32
    )
    devices = jax.devices()
    n_chips = len(devices)
    mesh = default_mesh(devices)

    dynamics, objective, constraints, x1, xT = acrobot.problem(T)
    spec = build_spec(dynamics, objective, constraints)
    opts = preset_options(preset, args)

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    # perturbed initial conditions around the hanging state (configs[3]).
    # Initialization protocol: nominal states = x0 spliced into zeros with
    # small constant controls.  (Alternatives measured: a consistent rollout
    # of the 0.05 controls swings chaotically over T=101 and costs ~40%
    # throughput; a zero-control rollout start makes the tuned solver grind.
    # All three are legitimate warm starts; this one is kept because it is
    # the protocol every recorded number in README/PARITY used, and the
    # integrity check below recomputes all violations from the returned
    # trajectories, so the reported solved fraction is init-independent.)
    x0 = 0.05 * jax.random.normal(key, (B, spec.nx), dtype)
    xs = jnp.zeros((B, T, spec.nx), dtype).at[:, 0, :].set(x0)
    us = 0.05 * jnp.ones((B, T - 1, spec.nu), dtype)
    ws = jnp.zeros((B, T, max(spec.npar, 0)), dtype)

    cache_dir = os.path.join(os.path.dirname(__file__), "benchmarks", "cache")

    if n_chips == 1:
        # single chip: plain jitted batch, served from the on-repo program
        # cache so the tunneled-backend lowering tax (~minutes) is paid once
        def make():
            batched = make_batched_solve_fn(spec, opts)

            def fn(xs, us, ws):
                sol = batched(xs, us, ws)
                return sol, batch_stats(sol, opts.constraint_tolerance)

            return fn

        import hashlib

        # options fingerprint: bench.py itself is outside the code hash, so a
        # preset/flag change must invalidate the artifact through the key
        opt_tag = hashlib.sha256(repr(opts).encode()).hexdigest()[:6]
        cache_key = (
            f"bench_acrobot_T{T}_B{B}_f32_{preset}_{opt_tag}_{ctag}"
        )
        use_compact = (
            not args.no_compact
            and opts.backward_pass in ("packed", "auto")
            and jax.default_backend() == "tpu"
        )

        def build_solve():
            if use_compact:
                # straggler compaction: the batched while-loop otherwise runs
                # until the SLOWEST instance converges (parity: mean 72 its,
                # max 216 — benchmarks/tail_analysis.py); the driver re-packs
                # the live tail into a smaller batch shape mid-solve
                from iterativelqr_tpu.core.solve_compact import (
                    make_compacted_solve_fn,
                )

                # chunk size deliberately NOT in the cache key: the dispatch
                # size is a traced argument, so the per-shape programs are
                # chunk-independent and --chunk sweeps reuse them
                solve_raw = make_compacted_solve_fn(
                    spec, opts, chunk=chunk,
                    cache_dir=cache_dir,
                    cache_key=cache_key,
                )
                stats_jit = jax.jit(
                    lambda s: batch_stats(s, opts.constraint_tolerance)
                )

                def fn(xs, us, ws):
                    sol = solve_raw(xs, us, ws)
                    return sol, stats_jit(sol)

                return fn
            return cached_program(
                make, cache_key, (xs, us, ws), cache_dir=cache_dir,
                verbose=True,
            )

        solve = build_solve()
    else:
        use_compact_nd = (
            not args.no_compact
            and opts.backward_pass in ("packed", "auto")
            and jax.default_backend() == "tpu"
        )
        if use_compact_nd:
            # per-DEVICE straggler compaction: one compaction loop per chip,
            # dispatches interleaved (core/solve_compact.py::solve_sharded)
            from iterativelqr_tpu.core.solve_compact import (
                make_compacted_solve_fn,
            )

            solve_raw = make_compacted_solve_fn(
                spec, opts, chunk=chunk, devices=devices
            )
            stats_jit = jax.jit(
                lambda s: batch_stats(s, opts.constraint_tolerance)
            )

            def solve(xs, us, ws):
                sol = solve_raw(xs, us, ws)
                return sol, stats_jit(sol)
        else:
            solve = make_sharded_solve_fn(spec, opts, mesh=mesh)
            xs, us, ws = shard_batch(mesh, "batch", xs, us, ws)

    # compile + warm
    sol, stats = solve(xs, us, ws)
    jax.block_until_ready(stats)

    if n_chips == 1:
        # integrity check: a deserialized pre-lowered program has been
        # observed to return garbage through the tunneled TPU backend (cache
        # HIT path only; the miss path is the freshly exported program).
        # Recompute violations from the returned trajectories with fresh jax
        # ops and compare solved fractions; on mismatch drop the artifact and
        # rebuild from a fresh lowering.
        from iterativelqr_tpu.ops import derivatives as dv_check

        ineq = jnp.asarray(spec.ineq_mask)
        cmask = jnp.asarray(spec.c_mask)

        def viol_one(xs_, us_):
            c = dv_check.constraint_values(spec, xs_, us_, ws[0])
            v = jnp.where(ineq, jnp.maximum(c, 0.0), jnp.abs(c))
            return jnp.max(jnp.where(cmask, v, 0.0))

        frac_true = float(
            jnp.mean(
                (jax.jit(jax.vmap(viol_one))(sol.xs, sol.us)
                 <= opts.constraint_tolerance).astype(jnp.float32)
            )
        )
        if abs(frac_true - float(stats.solved_fraction)) > 0.01:
            print(
                f"[bench] cached program failed integrity check "
                f"(program {float(stats.solved_fraction):.4f} vs recomputed "
                f"{frac_true:.4f}); rebuilding from fresh lowering",
                flush=True,
            )
            import pathlib

            for p in pathlib.Path(cache_dir).glob(f"{cache_key}*.jaxprog"):
                p.unlink()
            solve = build_solve()
            sol, stats = solve(xs, us, ws)
            jax.block_until_ready(stats)

    t0 = time.perf_counter()
    for _ in range(args.reps):
        sol, stats = solve(xs, us, ws)
        jax.block_until_ready(stats)
    dt = (time.perf_counter() - t0) / args.reps

    solved_fraction = float(stats.solved_fraction)
    solves_per_sec_per_chip = B * solved_fraction / dt / n_chips

    return {
        "metric": f"acrobot_T{T}_al_ilqr_solves_per_sec_per_chip",
        "value": round(solves_per_sec_per_chip, 3),
        "unit": "solves/s/chip",
        "preset": preset,
        "batch": B,
        "chunk": chunk,
        "chips": n_chips,
        "solved_fraction": round(solved_fraction, 4),
        "wall_clock_s": round(dt, 4),
        "mean_iterations": round(float(jnp.mean(sol.iterations)), 1),
        "max_iterations": int(jnp.max(sol.iterations)),
        "backend": devices[0].platform,
        "code_tag": ctag,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=CANONICAL_BATCH)
    ap.add_argument("--horizon", type=int, default=101)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true", help="small batch smoke run")
    ap.add_argument(
        "--no-compact", action="store_true",
        help="disable straggler compaction (single monolithic while-loop "
        "program; wall clock then rides the iteration-count tail)",
    )
    ap.add_argument(
        "--chunk", type=int, default=None,
        help="iterations per dispatch for the compaction driver "
        "(default: per-preset measured best — tuned 32, parity 48; "
        "A/B/A/B 2026-08-20: parity 48 beats 32 by ~5% riding its "
        "216-iteration tail with fewer host syncs, tuned 32 beats 48 by "
        "~8% because 48x2 dispatches overshoot its 101-iteration solve)",
    )
    ap.add_argument(
        "--early-cap", type=int, default=None,
        help="override Options.early_round_iteration_cap (schedule "
        "experiments; 0 = uncapped — the no-cap control for the tuned "
        "preset, which defaults to cap 20)",
    )
    ap.add_argument(
        "--mct", type=int, default=None,
        help="override Options.max_consecutive_truncations (schedule "
        "experiments; large values = pure truncation, safe only with the "
        "compaction driver's rescue pass)",
    )
    ap.add_argument(
        "--penalty", type=float, default=None,
        help="override Options.initial_constraint_penalty (AL schedule "
        "experiments; tuned preset default 1000)",
    )
    ap.add_argument(
        "--min-step", type=float, default=None, dest="min_step",
        help="override Options.min_step_size (line-search grid experiments: "
        "the candidate count is floor(log2(1/min_step))+1 — tuned preset "
        "4e-3 = 8 candidates, reference default 1e-5 = 17)",
    )
    ap.add_argument(
        "--fk", choices=["auto", "scan", "pallas"], default=None,
        help="override Options.forward_kernel (pallas line-search rollout "
        "kernels vs the lax.scan path — end-to-end A/B, round-4 verdict "
        "item 2)",
    )
    ap.add_argument(
        "--preset", choices=["tuned", "parity", "both"], default=None,
        help="tuned: hot-start AL penalty schedule + 8-alpha grid + pallas "
        "backward on TPU (same tolerances, fewer iterations, solved_fraction "
        "checked); parity: the default options — reference tolerances and "
        "knobs with the stall-gated adaptive AL schedule (adaptive_penalty); "
        "both (the default unless --quick): tuned headline + parity fields "
        "in the same JSON line, per-preset records written to benchmarks/",
    )
    args = ap.parse_args()
    if args.preset is None:
        # --quick defaults to parity so the smoke run hits the committed B64
        # program-cache artifacts (parity is what gets committed for B64)
        args.preset = "parity" if args.quick else "both"
    if args.quick:
        args.batch, args.reps = 64, 1

    # canonical-config guard: only a default-config run may overwrite the
    # committed benchmarks/BENCH_{preset}.json records; schedule/shape
    # experiments are tagged with their overrides instead (ADVICE round-4)
    overrides = {
        k: v
        for k, v in (
            ("batch", args.batch if args.batch != CANONICAL_BATCH else None),
            ("horizon", args.horizon if args.horizon != 101 else None),
            ("reps", args.reps if args.reps != 3 else None),
            ("no_compact", True if args.no_compact else None),
            ("chunk", args.chunk),
            ("early_cap", args.early_cap),
            ("mct", args.mct),
            ("fk", args.fk),
            ("min_step", args.min_step),
            ("penalty", args.penalty),
        )
        if v is not None
    }
    canonical = not overrides and not args.quick

    platform = acquire_backend()
    if platform is None:
        # One parseable line, fast — never a 20-minute hang + traceback
        # (round-2 bench was lost to exactly that; VERDICT.md item 1).
        print(
            json.dumps(
                {
                    "metric": f"acrobot_T{args.horizon}_al_ilqr_solves_per_sec_per_chip",
                    "value": None,
                    "unit": "solves/s/chip",
                    "error": "backend_unavailable",
                    "detail": "jax.devices() probe failed after bounded retries "
                    "(tunneled TPU backend down); see stderr for attempts",
                }
            ),
            flush=True,
        )
        sys.exit(1)

    # persistent compile cache: the solve program is large
    from iterativelqr_tpu.utils.compile_cache import setup_compile_cache

    setup_compile_cache(platform)

    ctag = code_tag()
    presets = ["tuned", "parity"] if args.preset == "both" else [args.preset]
    records = {p: run_preset(args, p, ctag) for p in presets}

    cache = os.path.join(os.path.dirname(__file__), "benchmarks", "baseline_local.json")
    baseline_sps, _ = measure_baseline(args.horizon, cache)
    for rec in records.values():
        rec["vs_baseline"] = round(rec["value"] / baseline_sps, 2)
        if overrides:
            rec["overrides"] = overrides

    # per-preset artifacts: committed so every round's parity number is
    # driver-verified at the same code hash as the headline (verdict item 7).
    # ONLY a canonical (default-config) run may overwrite them — a schedule
    # experiment must never masquerade as the committed record (ADVICE r4)
    if canonical:
        for p, rec in records.items():
            path = os.path.join(
                os.path.dirname(__file__), "benchmarks", f"BENCH_{p}.json"
            )
            with open(path, "w") as f:
                json.dump(rec, f)
                f.write("\n")
    elif not args.quick:
        print(
            f"[bench] non-canonical config {overrides}: committed "
            "benchmarks/BENCH_*.json records NOT overwritten",
            file=sys.stderr, flush=True,
        )

    headline = records[presets[0]]
    out = dict(headline)
    if "parity" in records and presets[0] != "parity":
        out["parity_value"] = records["parity"]["value"]
        out["parity_solved_fraction"] = records["parity"]["solved_fraction"]
        out["parity_wall_clock_s"] = records["parity"]["wall_clock_s"]
    # field order: metric/value/unit/vs_baseline first (driver contract)
    ordered = {
        k: out[k]
        for k in ("metric", "value", "unit", "vs_baseline")
    }
    ordered.update({k: v for k, v in out.items() if k not in ordered})
    print(json.dumps(ordered))


if __name__ == "__main__":
    main()
