"""On-chip throughput for heterogeneous-fleet MPC (one jitted program).

Fleet = 2link + iiwa + panda + trifinger (2..9 dofs, padded topology,
topology-as-data), B scenarios per member: R*B solves per call.

- KINEMATIC: `solve_fleet_kinematic_adam` (FK-only, the fleet analogue of
  the bench.py kinematic flagship).
- DYNAMIC: `solve_fleet_dynamic_adam` (full fleet forward dynamics in the
  loop).

Emits one JSON line per configuration; run on the TPU chip.

Usage: python benchmarks/fleet.py [--B 512] [--H 20] [--iters 10]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=512)
    ap.add_argument("--H", type=int, default=20)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import differentiable_robot_model_tpu as drm
    from differentiable_robot_model_tpu.models.fleet import (
        build_fleet,
        solve_fleet_dynamic_adam,
        solve_fleet_kinematic_adam,
    )
    from differentiable_robot_model_tpu.utils.profiling import benchmark

    members = [
        (drm.DifferentiableTwoLinkRobot(), "endEffector"),
        (drm.DifferentiableKUKAiiwa(), "iiwa_link_ee"),
        (drm.DifferentiableFrankaPanda(), "panda_virtual_ee_link"),
        (drm.DifferentiableTrifingerEdu(), "finger_tip_link_120"),
    ]
    structs = [m.struct for m, _ in members]
    fleet = build_fleet(structs, [ee for _, ee in members])
    R = len(structs)
    Dmax = fleet.damping.shape[-1]
    B = args.B

    rng = np.random.default_rng(0)
    q0 = np.zeros((R, B, Dmax), np.float32)
    for r, s in enumerate(structs):
        q0[r, :, : s.n_dofs] = rng.uniform(-0.4, 0.4, (B, s.n_dofs))
    q0 = jnp.asarray(q0)
    qd0 = jnp.zeros((R, B, Dmax), jnp.float32)
    goals = jnp.asarray(rng.uniform(0.15, 0.45, (R, B, 3)), jnp.float32)

    out_lines = [json.dumps({
        "backend": jax.default_backend(), "R": R, "B": B,
        "H": args.H, "iters": args.iters,
        "members": [s.name for s in structs],
    })]
    print(out_lines[-1], flush=True)

    def emit(d):
        line = json.dumps(d)
        print(line, flush=True)
        out_lines.append(line)

    kin = jax.jit(lambda q, g: solve_fleet_kinematic_adam(
        fleet, q, g, horizon=args.H, n_iters=args.iters, lr=0.02, eps=1e-3,
    ).actions)
    res = benchmark(kin, q0, goals, iters=5, warmup=1, windows=3)
    emit({
        "workload": "fleet_kinematic_mpc",
        "solve_batch_ms": round(res.best_s * 1e3, 2),
        "solves_per_s": round(R * B / res.best_s, 1),
    })

    dyn = jax.jit(lambda q, qd, g: solve_fleet_dynamic_adam(
        fleet, q, qd, g, horizon=args.H, n_iters=args.iters, lr=0.5,
        eps=1e-1,
    ).actions)
    res = benchmark(dyn, q0, qd0, goals, iters=3, warmup=1, windows=3)
    emit({
        "workload": "fleet_dynamic_mpc",
        "solve_batch_ms": round(res.best_s * 1e3, 2),
        "solves_per_s": round(R * B / res.best_s, 1),
    })

    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(out_lines) + "\n")


if __name__ == "__main__":
    main()
