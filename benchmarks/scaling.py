"""Scaling-efficiency harness: MPC solves/s vs device count.

Measures the mesh-sharded batched MPC solve (parallel/mesh.py) at 1..N
devices and reports throughput + weak-scaling efficiency. On this machine N
real chips are not available, so the default run uses N virtual CPU devices
(`--xla_force_host_platform_device_count`) — the *sharding program* is
identical on a real v5e/v5p slice; only the per-device constant changes.
On a pod slice, run with JAX_PLATFORMS unset and processes per host as
usual (jax.distributed.initialize), and the scenario axis spans
hosts via DCN with zero cross-device communication per solve.

Usage:
    python benchmarks/scaling.py [--devices 8] [--per-device 512]
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

    rows = []
    base = None
    n_avail = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= min(args.devices, n_avail)]
    for n in counts:
        mesh = make_mesh(jax.devices()[:n])
        B = args.per_device * n  # weak scaling: constant work per device
        rng = np.random.default_rng(0)
        scen = shard_scenarios(
            mesh,
            {
                "q0": jnp.asarray(rng.uniform(-0.5, 0.5, (B, struct.n_dofs)), jnp.float32),
                "goal": jnp.asarray(rng.uniform(0.2, 0.6, (B, 3)), jnp.float32),
            },
        )
        solver = sharded_batch_solver(mesh, solve_one)
        out = solver(scen)
        jax.block_until_ready(out)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = solver(scen)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        sps = B / dt
        if base is None:
            base = sps
        rows.append(
            {
                "devices": n,
                "batch": B,
                "solves_per_s": round(sps, 1),
                "weak_scaling_efficiency": round(sps / (base * n), 3),
            }
        )
        print(json.dumps(rows[-1]))

    return rows


if __name__ == "__main__":
    main()
