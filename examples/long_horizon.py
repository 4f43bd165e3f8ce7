"""Long-horizon solve with the Riccati backward time-sharded over a mesh.

The public entry for horizons whose derivative stacks outgrow one device's
HBM (parallel.make_long_horizon_solve_fn): the backward pass runs under
shard_map with the TIME axis split over the mesh — one all_gather of
per-chunk composites per backward pass (parallel/horizon.py; reference
analog: none, src/backward_pass.jl:42 is a serial loop on one core).

Runs anywhere: on CPU set a virtual mesh first, e.g.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 python - <<'PY'
    import jax; jax.config.update('jax_platforms', 'cpu')
    import runpy; runpy.run_path('examples/long_horizon.py', run_name='__main__')
    PY
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from iterativelqr_tpu import Options
from iterativelqr_tpu.core.spec import build_spec
from iterativelqr_tpu.models import pendulum
from iterativelqr_tpu.parallel import make_long_horizon_solve_fn, time_sharding


def main():
    T = 1025  # long horizon: the [T, nx*nx] derivative stacks are sharded
    devices = jax.devices()
    mesh = Mesh(np.asarray(devices), ("time",))
    print(f"{len(devices)} {devices[0].platform} device(s); horizon T={T}")

    dynamics, objective, constraints, x1, xT = pendulum.problem(T)
    spec = build_spec(dynamics, objective, constraints)

    solve = jax.jit(
        make_long_horizon_solve_fn(
            spec, Options(verbose=False, record_traces=False, scan_unroll=1),
            mesh=mesh,
        )
    )

    xs = jnp.zeros((T, spec.nx)).at[0].set(x1)
    us = 0.01 * jnp.ones((T - 1, spec.nu))
    # place the control stack time-sharded (T-1 = 1024 divides any mesh
    # size here); the derivative stacks inherit the placement under SPMD
    us = jax.device_put(us, time_sharding(mesh))
    ws = jnp.zeros((T, max(spec.npar, 0)))

    sol = solve(xs, us, ws)
    jax.block_until_ready(sol.xs)
    print(f"objective:     {float(sol.objective):.6f}")
    print(f"max violation: {float(sol.max_violation):.2e}")
    print(f"iterations:    {int(sol.iterations)}")
    assert bool(jnp.isfinite(sol.objective))


if __name__ == "__main__":
    main()
