"""Headline benchmark: iiwa MPC solves/s/chip (H=50, B=4096 scenarios).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Definition of a "solve" (BASELINE.json metric: "MPC solves/s/chip at iiwa
H=50 B=4096; control-seq max-err vs CPU ref"): one kinematic MPC replan —
10 warm-start-budget Adam iterations over an H=50 action sequence through
the differentiable FK rollout with joint-limit clamping (the reference's
trajectory-optimization workload, examples/run_kinematic_trajectory_opt.py,
at MPC replanning budget). All B=4096 scenarios are solved in one jitted
vmapped program on the chip.

vs_baseline scales against the north-star target of >10,000 solves/s on a
16-chip v5p slice = 625 solves/s/chip (the reference publishes no
performance numbers at all — BASELINE.md).

Also cross-checks the first 8 scenarios' optimized control sequences against
the same solver run on the host CPU backend (control-seq max-err).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import differentiable_robot_model_tpu as drm
    from differentiable_robot_model_tpu.trajopt.solvers import (
        solve_kinematic_adam_batch,
    )

    B, H, ITERS = 4096, 50, 10

    robot = drm.DifferentiableKUKAiiwa()
    struct = robot.struct
    ee_idx = struct.link_index("iiwa_link_ee")

    rng = np.random.default_rng(0)
    limits = robot.get_joint_limits()
    lo = np.array([l["lower"] for l in limits], np.float32)
    hi = np.array([l["upper"] for l in limits], np.float32)
    q0 = rng.uniform(0.3 * lo, 0.3 * hi, (B, 7)).astype(np.float32)
    q_goal = rng.uniform(0.5 * lo, 0.5 * hi, (B, 7)).astype(np.float32)
    goals, _ = robot.compute_forward_kinematics(q_goal, "iiwa_link_ee")
    goals = jnp.asarray(goals)
    q0 = jnp.asarray(q0)

    on_tpu = jax.default_backend() == "tpu"

    def make_solver(fk_impl):
        return jax.jit(
            lambda q0_b, goal_b: solve_kinematic_adam_batch(
                struct, q0_b, goal_b, ee_idx,
                horizon=H, n_iters=ITERS, lr=0.05, fk_impl=fk_impl, eps=1.0,
            ).actions
        )

    solve_batch = make_solver("pallas" if on_tpu else "scalar")

    # Warmup / compile.
    actions = solve_batch(q0, goals)
    jax.block_until_ready(actions)

    # Throughput timing: dispatch a stream of solves and block once — the
    # deployment shape (the device pipeline stays full). Per-call blocking
    # would instead measure the ~25 ms development-tunnel roundtrip. reps=30
    # amortizes warmup and tunnel jitter; best-of-3 windows for stability.
    reps = 30
    window_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            actions = solve_batch(q0, goals)
        jax.block_until_ready(actions)
        window_times.append((time.perf_counter() - t0) / reps)
    dt = min(window_times)
    solves_per_s = B / dt

    # Control-sequence parity vs the CPU backend (same precision, same
    # algorithm; catches backend-dependent numerical drift).
    max_err = float("nan")
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            small = 8
            cpu_actions = make_solver("scalar")(
                jax.device_put(q0[:small], cpu), jax.device_put(goals[:small], cpu)
            )
            jax.block_until_ready(cpu_actions)
        max_err = float(
            jnp.max(jnp.abs(jnp.asarray(actions[:small]) - np.asarray(cpu_actions)))
        )
    except Exception:
        pass

    target_per_chip = 10000.0 / 16.0
    print(
        json.dumps(
            {
                "metric": "mpc_solves_per_s_per_chip",
                "value": round(solves_per_s, 1),
                "unit": "solves/s (iiwa kinematic MPC, H=50, B=4096, 10 Adam iters)",
                "vs_baseline": round(solves_per_s / target_per_chip, 3),
                "control_seq_max_err_vs_cpu": max_err,
                "solve_batch_latency_ms": round(dt * 1e3, 3),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
