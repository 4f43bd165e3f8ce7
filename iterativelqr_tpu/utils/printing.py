"""Host-side presentation: banner and per-iteration status table.

The reference prints a Crayons banner (src/print.jl:1-14) and per-iteration
lines from inside the solve loop (src/solve.jl:40-45).  Device code cannot
print without host round-trips, so the solve returns structured trace arrays
(cost / gradient norm / violation / step size per inner iteration) and the
table is rendered host-side afterwards — the reference's broken, never-called
``iteration_status`` (src/print.jl:16-43) done right.
"""

from __future__ import annotations

import numpy as np

_BANNER = r"""
 ┌─────────────────────────────────────────────────────────┐
 │  iterativelqr-tpu — constrained iLQR / AL-iLQR on XLA   │
 │  jax · pallas · pjit                                    │
 └─────────────────────────────────────────────────────────┘
"""


def solver_info():
    print(_BANNER)


def live_progress_line(al_it, inner_it, J, grad_norm, viol):
    """One in-flight progress line, invoked from inside the jitted solve via
    ``jax.debug.callback`` when ``Options.live_progress`` is set (the
    reference prints during the solve, src/solve.jl:40-45,106).  Values arrive
    as device scalars."""
    print(
        f"  [al {int(al_it):>2}] inner {int(inner_it):>4}  "
        f"J {float(J):>13.6e}  |grad| {float(grad_norm):>10.4e}  "
        f"viol {float(viol):>10.4e}",
        flush=True,
    )


def print_solution(sol):
    tm = np.asarray(sol.trace_mask)
    tc = np.asarray(sol.trace_cost)
    tg = np.asarray(sol.trace_gradient_norm)
    tv = np.asarray(sol.trace_violation)
    ts = np.asarray(sol.trace_step_size)
    header = f"{'al':>3} {'iter':>5} {'objective':>14} {'|grad|_inf':>12} {'viol':>12} {'step':>9}"
    print(header)
    print("-" * len(header))
    for a in range(tm.shape[0]):
        for i in range(tm.shape[1]):
            if tm[a, i]:
                print(
                    f"{a:>3} {i:>5} {tc[a, i]:>14.6e} {tg[a, i]:>12.4e} "
                    f"{tv[a, i]:>12.4e} {ts[a, i]:>9.2e}"
                )
    print(
        f"\n  objective:      {float(sol.objective):.6e}"
        f"\n  gradient norm:  {float(sol.gradient_norm):.4e}"
        f"\n  max violation:  {float(sol.max_violation):.4e}"
        f"\n  iterations:     {int(sol.iterations)} inner / {int(sol.al_iterations)} dual updates"
    )
