"""Scaling-efficiency harness: MPC solves/s vs device count.

Measures the mesh-sharded batched MPC solve (parallel/mesh.py) at 1..N
devices and reports throughput + weak-scaling efficiency. On this machine N
real chips are not available, so the default run uses N virtual CPU devices
(`--xla_force_host_platform_device_count`) — the *sharding program* is
identical on a real v5e/v5p slice; only the per-device constant changes.
On a pod slice, run with JAX_PLATFORMS unset and processes per host as
usual (jax.distributed.initialize), and the scenario axis spans
hosts via DCN with zero cross-device communication per solve.

Round-4 refresh (verdict item 6): rows for the CURRENT flagship programs —
the dof-major sharded kinematic MPC, the sharded dynamic (torque-space) MPC
(the programs bench.py's headline numbers run single-chip), and a sharded
batched iLQR — alongside the original per-sample kinematic solver.

Usage:
    python benchmarks/scaling.py [--devices 8] [--per-device 512] [--out F]
"""

import argparse
import json
import os
import sys
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, default=8)
    parser.add_argument("--per-device", type=int, default=512)
    parser.add_argument("--horizon", type=int, default=50)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--virtual-cpu", action="store_true", default=True)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    if args.virtual_cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    if args.virtual_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import differentiable_robot_model_tpu as drm
    from differentiable_robot_model_tpu.parallel.mesh import (
        make_mesh,
        shard_scenarios,
        sharded_batch_solver,
    )
    from differentiable_robot_model_tpu.trajopt.solvers import solve_kinematic_adam

    struct = drm.DifferentiableKUKAiiwa().struct
    ee = struct.link_index("iiwa_link_ee")

    def solve_one(sc):
        return solve_kinematic_adam(
            struct, sc["q0"], sc["goal"], ee,
            horizon=args.horizon, n_iters=args.iters,
        ).cost

    if args.virtual_cpu:
        print(
            json.dumps(
                {
                    "note": "virtual CPU devices share one host's cores: this run "
                    "validates the sharding program, NOT hardware scaling - "
                    "total host throughput is constant so efficiency ~ 1/n. "
                    "On a real slice each device is a chip and the solve has "
                    "zero cross-chip communication (scenario-parallel)."
                }
            )
        )

    from differentiable_robot_model_tpu.parallel.mesh import (
        sharded_dynamic_mpc,
        sharded_kinematic_mpc,
    )

    rows = []
    bases = {}
    n_avail = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= min(args.devices, n_avail)]
    rng = np.random.default_rng(0)

    def record(workload, n, B, dt):
        sps = B / dt
        if workload not in bases:
            bases[workload] = sps
        rows.append(
            {
                "workload": workload,
                "devices": n,
                "batch": B,
                "solves_per_s": round(sps, 1),
                "weak_scaling_efficiency": round(sps / (bases[workload] * n), 3),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    def timeit(fn, fargs, reps=3):
        out = fn(*fargs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*fargs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    for n in counts:
        mesh = make_mesh(jax.devices()[:n])
        B = args.per_device * n  # weak scaling: constant work per device
        q0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, struct.n_dofs)), jnp.float32)
        goal = jnp.asarray(rng.uniform(0.2, 0.6, (B, 3)), jnp.float32)

        # original per-sample kinematic solver under sharded_batch_solver
        scen = shard_scenarios(mesh, {"q0": q0, "goal": goal})
        solver = sharded_batch_solver(mesh, solve_one)
        record("kinematic_per_sample", n, B, timeit(solver, (scen,)))

        # flagship dof-major kinematic MPC (the bench.py headline program;
        # scalar FK on the virtual-CPU mesh, Pallas on a real slice)
        kin = sharded_kinematic_mpc(
            mesh, struct, ee, horizon=args.horizon, n_iters=args.iters,
            lr=0.05, fk_impl="scalar", eps=1.0,
        )
        record("kinematic_dof_major", n, B, timeit(kin, (q0, goal)))

        # flagship dynamic (torque-space) MPC — forward dynamics in the
        # loop; smaller per-device batch, the CPU scalar path is ~50x the
        # kinematic cost per scenario
        Bd = max(n, args.per_device // 8) * n
        q0d = jnp.asarray(rng.uniform(-0.5, 0.5, (Bd, struct.n_dofs)), jnp.float32)
        qd0d = jnp.zeros_like(q0d)
        goald = jnp.asarray(rng.uniform(0.2, 0.6, (Bd, 3)), jnp.float32)
        dyn = sharded_dynamic_mpc(
            mesh, struct, ee, horizon=min(args.horizon, 20),
            n_iters=min(args.iters, 5), eps=1e-1,
        )
        record("dynamic_dof_major", n, Bd, timeit(dyn, (q0d, qd0d, goald)))

        # batched iLQR (second-order) sharded per scenario
        from differentiable_robot_model_tpu.ops.dynamics_scalar import (
            rnea_scalar,
        )
        from differentiable_robot_model_tpu.trajopt.rollout import (
            fd_step_implicit_damping,
        )
        from differentiable_robot_model_tpu.trajopt.solvers import ilqr

        D = struct.n_dofs
        dt_i = 0.02
        Hi, Bi = 10, 8 * n

        def idynamics(x, u):
            q, qd = x[:D], x[D:]
            qdd = fd_step_implicit_damping(struct, q, qd, u, dt_i)
            qd2 = qd + dt_i * qdd
            return jnp.concatenate([q + dt_i * qd2, qd2])

        def isolve(sc):
            from differentiable_robot_model_tpu.ops import kinematics as K

            def cost(x, u):
                p = K.fk_link_position(struct, x[:D], ee)
                du = u - sc["tau_ref"]
                return 10.0 * jnp.sum((p - sc["goal"]) ** 2) + 1e-4 * jnp.sum(
                    du * du
                )

            def fcost(x):
                p = K.fk_link_position(struct, x[:D], ee)
                return 100.0 * jnp.sum((p - sc["goal"]) ** 2)

            us0 = jnp.tile(sc["tau_ref"][None], (Hi, 1))
            return ilqr(
                idynamics, cost, fcost, sc["x0"], us0, n_iters=3
            ).cost

        q0i = jnp.asarray(rng.uniform(-0.4, 0.4, (Bi, D)), jnp.float32)
        tau_ref = rnea_scalar(struct, q0i.T, 0.0 * q0i.T, 0.0 * q0i.T).T
        sci = shard_scenarios(
            mesh,
            {
                "x0": jnp.concatenate([q0i, jnp.zeros_like(q0i)], axis=1),
                "goal": jnp.asarray(rng.uniform(0.2, 0.6, (Bi, 3)), jnp.float32),
                "tau_ref": tau_ref,
            },
        )
        isolver = sharded_batch_solver(mesh, isolve)
        record("ilqr", n, Bi, timeit(isolver, (sci,)))

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows, "virtual_cpu": args.virtual_cpu}, f,
                      indent=1)
    return rows


if __name__ == "__main__":
    main()
