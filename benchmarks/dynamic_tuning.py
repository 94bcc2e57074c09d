"""Tuning sweep for the dynamic (torque-space) MPC flagship solve.

Measures `solve_dynamic_adam_batch` (iiwa, H=50, B=4096, 10 Adam iters —
the BENCH dynamic workload) across the rollout knobs that only matter on
real hardware:

- `rollout_unroll`: horizon-scan unroll factor (cross-step XLA fusion vs
  compile time),
- `rollout_remat`: checkpointed integration step (recompute forward-dynamics
  intermediates in the backward sweep instead of storing them — HBM-traffic
  for FLOPs).

Values/gradients are knob-independent (tests/test_trajopt.py); this sweep
is pure performance. Emits one JSON line per configuration; run on the TPU
chip and bake the winner into bench.py / solver defaults.

Usage: python benchmarks/dynamic_tuning.py [--B 4096] [--H 50] [--iters 10]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=4096)
    ap.add_argument("--H", type=int, default=50)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import differentiable_robot_model_tpu as drm
    from differentiable_robot_model_tpu.trajopt.solvers import (
        solve_dynamic_adam_batch,
    )
    from differentiable_robot_model_tpu.utils.profiling import benchmark

    struct = drm.DifferentiableKUKAiiwa().struct
    ee = struct.link_index("iiwa_link_ee")
    rng = np.random.default_rng(0)
    lo = np.asarray(struct.limit_lower, np.float32)
    hi = np.asarray(struct.limit_upper, np.float32)
    q0 = jnp.asarray(rng.uniform(0.4 * lo, 0.4 * hi, (args.B, 7)), jnp.float32)
    qd0 = jnp.zeros((args.B, 7), jnp.float32)
    from differentiable_robot_model_tpu.ops import kinematics as K

    qg = jnp.asarray(rng.uniform(0.5 * lo, 0.5 * hi, (args.B, 7)), jnp.float32)
    goals = jax.vmap(lambda q: K.fk_world(struct, q)[1][ee])(qg)

    out_lines = [json.dumps({"backend": jax.default_backend(),
                             "B": args.B, "H": args.H, "iters": args.iters})]
    print(out_lines[-1])
    for unroll in (1, 2, 5):
        for remat in (False, True):
            fn = jax.jit(
                lambda q, qd, g, u=unroll, r=remat: solve_dynamic_adam_batch(
                    struct, q, qd, g, ee, horizon=args.H,
                    n_iters=args.iters, lr=0.5, eps=1e-1,
                    rollout_unroll=u, rollout_remat=r,
                ).actions
            )
            res = benchmark(fn, q0, qd0, goals, iters=3, warmup=1, windows=3)
            dt = res.best_s
            line = json.dumps(
                {
                    "rollout_unroll": unroll,
                    "rollout_remat": remat,
                    "solve_batch_ms": round(dt * 1e3, 2),
                    "solves_per_s": round(args.B / dt, 1),
                }
            )
            print(line, flush=True)
            out_lines.append(line)

    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(out_lines) + "\n")


if __name__ == "__main__":
    main()
