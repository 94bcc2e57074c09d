"""Replanning-latency benchmark: the 1 kHz-class per-step budget.

Measures warm-started MPC replan latency (one jitted MPC step:
solve-with-warm-start + execute + shift) for several (horizon, iters) budgets
at B=1 and at fleet scale, on the current default backend (the real TPU chip
when available).

Usage: python benchmarks/latency.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(step_fn, args, reps=50):
    """Pipelined mean step time via the canonical timer (warmup=1 pays the
    compile outside timing)."""
    from differentiable_robot_model_tpu.utils.profiling import benchmark

    return benchmark(step_fn, *args, iters=reps, warmup=1).mean_s


def main():
    import jax
    import jax.numpy as jnp

    import differentiable_robot_model_tpu as drm
    from differentiable_robot_model_tpu.trajopt.mpc import (
        MPCConfig,
        make_mpc_step,
        mpc_init,
    )

    struct = drm.DifferentiableKUKAiiwa().struct
    ee = struct.link_index("iiwa_link_ee")
    goal = jnp.asarray([0.4, 0.1, 0.7], jnp.float32)

    print(json.dumps({"backend": jax.default_backend()}))
    for horizon, iters in [(50, 10), (50, 3), (20, 3), (10, 2)]:
        config = MPCConfig(horizon=horizon, iters_per_step=iters)
        step = jax.jit(make_mpc_step(struct, ee, config))
        state = mpc_init(struct, jnp.zeros(7, jnp.float32), config)
        dt = measure(step, (state, goal))
        # batched fleet replanning at B=4096 (dof-major batched solver with
        # the fused Pallas FK kernels; scalar XLA path off-TPU)
        from differentiable_robot_model_tpu.trajopt.mpc import make_mpc_step_batch

        fk_impl = "pallas" if jax.default_backend() == "tpu" else "scalar"
        stepB = jax.jit(make_mpc_step_batch(struct, ee, config, fk_impl=fk_impl))
        B = 4096
        states = jax.vmap(lambda q: mpc_init(struct, q, config))(
            jnp.zeros((B, 7), jnp.float32)
        )
        goals = jnp.tile(goal[None], (B, 1))
        dtB = measure(stepB, (states, goals), reps=10)
        print(
            json.dumps(
                {
                    "horizon": horizon,
                    "iters": iters,
                    "replan_latency_ms_B1": round(dt * 1e3, 3),
                    "replan_rate_hz_B1": round(1.0 / dt, 1),
                    "replan_latency_ms_B4096": round(dtB * 1e3, 3),
                    "replans_per_s_B4096": round(B / dtB, 1),
                }
            )
        )

    # Dynamic (torque-space) closed-loop MPC step: the full forward
    # dynamics in the replan loop (trajopt/mpc.make_dynamic_mpc_step).
    from differentiable_robot_model_tpu.trajopt.mpc import (
        DynamicMPCConfig,
        dynamic_mpc_init,
        make_dynamic_mpc_step,
        make_dynamic_mpc_step_batch,
    )

    for horizon, iters in [(50, 10), (20, 3)]:
        dconfig = DynamicMPCConfig(horizon=horizon, iters_per_step=iters)
        dstep = jax.jit(make_dynamic_mpc_step(struct, ee, dconfig))
        dstate = dynamic_mpc_init(
            struct, jnp.zeros(7, jnp.float32), jnp.zeros(7, jnp.float32),
            dconfig,
        )
        ddt = measure(dstep, (dstate, goal), reps=20)
        B = 1024
        dstepB = jax.jit(make_dynamic_mpc_step_batch(struct, ee, dconfig))
        dstatesB = jax.vmap(
            lambda q: dynamic_mpc_init(struct, q, jnp.zeros(7, jnp.float32),
                                       dconfig)
        )(jnp.zeros((B, 7), jnp.float32))
        goalsB = jnp.tile(goal[None], (B, 1))
        ddtB = measure(dstepB, (dstatesB, goalsB), reps=5)
        print(
            json.dumps(
                {
                    "workload": "dynamic_mpc_step",
                    "horizon": horizon,
                    "iters": iters,
                    "replan_latency_ms_B1": round(ddt * 1e3, 3),
                    "replan_rate_hz_B1": round(1.0 / ddt, 1),
                    "replan_latency_ms_B1024": round(ddtB * 1e3, 3),
                    "replans_per_s_B1024": round(B / ddtB, 1),
                }
            )
        )


if __name__ == "__main__":
    main()
