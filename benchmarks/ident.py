"""Identification-THROUGH-MPC throughput (round-4 verdict #6).

The L4DC story at scale (SURVEY.md §7 config 5): robot parameters are
identified by differentiating through the full MPC solve —
`jax.grad(loss(robot_params))` where the loss contains an entire
`solve_*_adam_batch` (itself an n_iters scan of value_and_grad + Adam).
The whole-solve / rollout kernels decline traced robots BY DESIGN (their
constants are folded as Mosaic immediates), so this workload runs the
scan/scalar path; this benchmark measures what that path actually delivers
at flagship-adjacent shapes and A/Bs the available levers (rollout remat
on/off, scan unroll) so the kernel-vs-scan decision is recorded, not
guessed.

Emits one JSON line per row. Usage: python benchmarks/ident.py [--out FILE]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/drm_tpu_jax_cache")
    import jax.numpy as jnp

    import differentiable_robot_model_tpu as drm
    from differentiable_robot_model_tpu.ops.kinematics import (
        fk_link_position_dof_first,
    )
    from differentiable_robot_model_tpu.trajopt.solvers import (
        solve_dynamic_adam_batch,
        solve_kinematic_adam_batch,
    )
    from differentiable_robot_model_tpu.utils.profiling import benchmark

    struct = drm.DifferentiableKUKAiiwa().struct
    ee = struct.link_index("iiwa_link_ee")
    rng = np.random.default_rng(0)

    out_lines = [json.dumps({"backend": jax.default_backend()})]
    print(out_lines[-1], flush=True)

    def emit(d):
        out_lines.append(json.dumps(d))
        print(out_lines[-1], flush=True)
        if args.out:  # incremental: a killed run keeps its rows
            with open(args.out, "w") as f:
                f.write("\n".join(out_lines) + "\n")

    def scen(B, seed):
        q0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 7)), jnp.float32)
        qg = jnp.asarray(rng.uniform(-0.7, 0.7, (B, 7)), jnp.float32)
        goals = fk_link_position_dof_first(struct, qg.T, ee).T
        return q0, goals

    # ------------------------------------------------------------------
    # Kinematic identification: d(total solve cost)/d(link translations)
    # through the FULL batched Adam solve (traced robot -> scalar FK path).
    # ------------------------------------------------------------------
    # NOTE: each row is a second-order XLA graph (grad THROUGH an
    # n_iters-scan of value_and_grad); compile is minutes per row on the
    # chip, so the grid is kept small and n_iters moderate.
    for B, H, KIT in [(256, 20, 10), (1024, 20, 10), (256, 50, 5)]:
        q0, goals = scen(B, 1)

        def loss(trans, q0, goals):
            s2 = struct.with_arrays(trans=trans)
            res = solve_kinematic_adam_batch(
                s2, q0, goals, ee, horizon=H, n_iters=KIT,
                lr=0.05, eps=1.0, fk_impl="scalar",
            )
            return jnp.sum(res.cost)

        g = jax.jit(jax.grad(loss))
        r = benchmark(g, struct.trans, q0, goals,
                      iters=args.reps, warmup=1, windows=3)
        emit({
            "workload": "ident_kinematic_grad_step", "B": B, "H": H,
            "n_iters": KIT, "param": "trans",
            "step_ms_best": round(r.best_s * 1e3, 2),
            "ident_steps_per_s": round(1.0 / r.best_s, 2),
            "scenario_grads_per_s": round(B / r.best_s, 1),
        })

    # ------------------------------------------------------------------
    # Dynamic identification: d(cost)/d(mass) through the torque-space
    # solve; A/B the rollout remat + unroll levers on the traced path.
    # ------------------------------------------------------------------
    for B, H, remat, unroll in [
        (256, 20, True, 1),
        (256, 20, False, 1),
        (256, 20, True, 4),
    ]:
        q0, goals = scen(B, 2)
        qd0 = jnp.zeros((B, 7), jnp.float32)

        def loss(mass, q0, qd0, goals):
            s2 = struct.with_arrays(mass=mass)
            res = solve_dynamic_adam_batch(
                s2, q0, qd0, goals, ee, horizon=H, n_iters=3, eps=1e-1,
                rollout_impl="scan", rollout_remat=remat,
                rollout_unroll=unroll,
            )
            return jnp.sum(res.cost)

        g = jax.jit(jax.grad(loss))
        try:
            r = benchmark(g, struct.mass, q0, qd0, goals,
                          iters=args.reps, warmup=1, windows=3)
        except Exception as e:  # OOM at this shape: record it honestly
            emit({
                "workload": "ident_dynamic_grad_step", "B": B, "H": H,
                "remat": remat, "unroll": unroll,
                "error": type(e).__name__,
            })
            continue
        emit({
            "workload": "ident_dynamic_grad_step", "B": B, "H": H,
            "n_iters": 3, "param": "mass", "remat": remat,
            "unroll": unroll,
            "step_ms_best": round(r.best_s * 1e3, 2),
            "ident_steps_per_s": round(1.0 / r.best_s, 2),
            "scenario_grads_per_s": round(B / r.best_s, 1),
        })

    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(out_lines) + "\n")


if __name__ == "__main__":
    main()
