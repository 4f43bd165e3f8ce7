"""Receding-horizon MPC with disturbance rejection (core/mpc.py).

A particle is repeatedly pushed off course by noise; the jitted MPC step
shifts the previous plan, injects the measured state, re-solves warm-started
(carrying AL duals), and applies the first action.

Run: python examples/mpc_demo.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from iterativelqr_tpu import Constraint, Cost, Dynamics, Options
from iterativelqr_tpu.core.mpc import make_mpc_controller
from iterativelqr_tpu.core.spec import build_spec
from iterativelqr_tpu.models import particle


def main():
    T = 11
    xT = jnp.array([1.0, 0.0])
    # tracking formulation: the stage cost pulls toward the goal (the library
    # particle problem's origin-centered cost would park a receding-horizon
    # controller at the origin)
    dyn = Dynamics(particle.particle_discrete, 2, 1)
    stage = Cost(
        lambda x, u: 0.5 * jnp.sum((x - xT) ** 2) + 0.1 * jnp.sum(u**2), 2, 1
    )
    term = Cost(lambda x, u: 0.5 * jnp.sum((x - xT) ** 2), 2, 0)
    goal = Constraint(lambda x, u: x - xT, 2, 0)
    dynamics = [dyn] * (T - 1)
    spec = build_spec(
        dynamics,
        [stage] * (T - 1) + [term],
        [Constraint() for _ in range(T - 1)] + [goal],
    )
    # the controller's warm-start policy (closed-loop shift re-roll, dual +
    # capped-penalty carry, step-tightened objective tolerance) is the
    # default — see core/mpc.py and benchmarks/mpc_bench.py for measurements
    opts = Options(verbose=False, record_traces=False)
    init, step = make_mpc_controller(spec, opts)
    step = jax.jit(step)

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    ws = jnp.zeros((T, max(spec.npar, 0)), dtype)
    state = init(
        jnp.zeros((T, spec.nx), dtype), jnp.zeros((T - 1, spec.nu), dtype)
    )

    f = dynamics[0]
    x = jnp.array([-0.6, 0.4], dtype)
    key = jax.random.PRNGKey(0)
    print(f"{'step':>4} {'x':>24} {'u0':>9} {'plan viol':>10}")
    for i in range(30):
        key, sub = jax.random.split(key)
        out = step(state, x, ws)
        state = out.state
        noise = 0.02 * jax.random.normal(sub, (2,), dtype) if i < 5 else 0.0
        x = f(x, out.action) + noise
        if i % 3 == 0 or i >= 27:
            print(
                f"{i:>4} [{float(x[0]):>10.4f} {float(x[1]):>10.4f}] "
                f"{float(out.action[0]):>9.4f} {float(out.solution.max_violation):>10.2e}"
            )
    print("\nfinal measured state:", np.asarray(x), " goal:", np.asarray(xT))


if __name__ == "__main__":
    main()
