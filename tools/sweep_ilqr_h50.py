"""iLQR-at-H=50 sweep (round-3 verdict item 2: "make the second-order path
win, or honestly lose, at the flagship horizon").

Round 3 measured iLQR at H=50 LOSING to equal-budget Adam on final goal
distance (0.590 vs 0.311, BENCH_r03.json) and a 12x closed-loop cliff from
H=20 to H=50. Two candidate mechanisms, both measured here on the flagship
scenario set (B=64, H=50, the bench.py config):

1. OBJECTIVE MISMATCH (found reading the bench): the round-3 iLQR cost
   penalized ABSOLUTE torque (1e-4 |u|^2 — including the ~40 Nm gravity
   compensation, ~1.1/stage just to hold the arm up) while the Adam solver
   penalizes only deltas around gravity comp. bench.py now penalizes
   deltas (u - tau_ref); this sweep runs BOTH costs at the same budget so
   the mechanism's size is on record.
2. ITERATION BUDGET: 5 iterations may simply not converge a 50-step
   nonlinear reach. Sweep n_iters with wall time, find iters-to-Adam-parity.

Plus a line-search-grid probe (extended small alphas) at the best config.

Writes ILQR_H50_r04.json. Run on the TPU chip:
    python tools/sweep_ilqr_h50.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/drm_tpu_jax_cache")
    import jax.numpy as jnp

    import bench
    from differentiable_robot_model_tpu.ops import kinematics as K
    from differentiable_robot_model_tpu.trajopt.rollout import (
        _velocity_bound,
        fd_step_implicit_damping,
    )
    from differentiable_robot_model_tpu.trajopt.solvers import ilqr
    from differentiable_robot_model_tpu.utils.profiling import benchmark

    struct, ee_idx, q0_np, goals_np = bench._build_scenarios()
    B, H = bench.ILQR_B, bench.H
    q0 = jnp.asarray(q0_np[:B])
    qd0 = jnp.zeros_like(q0)
    goals = jnp.asarray(goals_np[:B])
    x0s = jnp.concatenate([q0, qd0], axis=1)
    us0 = bench._ilqr_warm_start(struct, q0, H)
    D = struct.n_dofs
    vmax = _velocity_bound(struct, 0)

    def dynamics(x, u):
        q, qd = x[:D], x[D:]
        qdd = fd_step_implicit_damping(struct, q, qd, u, bench.DYN_DT)
        qd2 = jnp.clip(qd + bench.DYN_DT * qdd, -vmax, vmax)
        return jnp.concatenate([q + bench.DYN_DT * qd2, qd2])

    def make_solver(n_iters, effort_on="delta", alphas=None):
        kw = {} if alphas is None else {"line_search_alphas": alphas}

        def solve_one(x0, us0_b, goal):
            tau_ref = us0_b[0]

            def cost(x, u):
                p = K.fk_link_position(struct, x[:D], ee_idx)
                du = u - tau_ref if effort_on == "delta" else u
                return 10.0 * jnp.sum((p - goal) ** 2) + 1e-4 * jnp.sum(du * du)

            def final_cost(x):
                p = K.fk_link_position(struct, x[:D], ee_idx)
                return 100.0 * jnp.sum((p - goal) ** 2)

            return ilqr(
                dynamics, cost, final_cost, x0, us0_b, n_iters=n_iters, **kw
            ).us

        return jax.jit(jax.vmap(solve_one))

    rows = []

    def emit(d):
        rows.append(d)
        print(json.dumps(d), flush=True)

    emit({"backend": jax.default_backend(), "B": B, "H": H})

    def run(label, n_iters, effort_on="delta", alphas=None, reps=3):
        solver = make_solver(n_iters, effort_on, alphas)
        t0 = time.time()
        us = solver(x0s, us0, goals)
        jax.block_until_ready(us)
        compile_s = time.time() - t0
        res = benchmark(solver, x0s, us0, goals, iters=reps, warmup=0,
                        windows=3)
        gd = bench._final_goal_dist(struct, ee_idx, q0, qd0, us, goals)
        emit({
            "config": label, "n_iters": n_iters, "effort_on": effort_on,
            "alphas": list(alphas) if alphas else "default",
            "solve_ms": round(res.best_s * 1e3, 2),
            "final_goal_dist_m": round(gd, 4),
            "compile_s": round(compile_s, 1),
        })
        return res.best_s, gd

    # mechanism 1: old (absolute-torque) vs new (delta) effort at 5 iters
    run("r03_cost_absolute_torque", 5, effort_on="absolute")
    t5, gd5 = run("delta_cost", 5)

    # mechanism 2: iteration budget
    t10, gd10 = run("delta_cost", 10)
    t20, gd20 = run("delta_cost", 20)

    # line-search grid probe at 10 iters: extended small alphas
    run("delta_cost_ext_alphas", 10,
        alphas=(1.0, 0.5, 0.25, 0.1, 0.03, 0.01, 0.003, 0.001))

    # Adam quality at the measured iLQR budgets (the equal-budget
    # comparison, plant-matched): scale Adam iterations to each iLQR
    # wall-clock using Adam's measured per-solve time.
    dyn_impl = "pallas" if jax.default_backend() == "tpu" else "scan"
    adam = bench._dyn_solver(struct, ee_idx, bench.DYN_EPS, dyn_impl)
    adam_us = adam(q0, qd0, goals)
    jax.block_until_ready(adam_us)
    adam_dt = benchmark(adam, q0, qd0, goals, iters=5, warmup=0,
                        windows=3).best_s
    for label, t_target in (("ilqr5", t5), ("ilqr10", t10), ("ilqr20", t20)):
        n_eq = int(min(200, max(bench.ITERS,
                                round(bench.ITERS * t_target / adam_dt))))
        adam_eq = bench._dyn_solver(struct, ee_idx, bench.DYN_EPS, dyn_impl,
                                    n_iters=n_eq)
        eq_us = adam_eq(q0, qd0, goals)
        jax.block_until_ready(eq_us)
        eq_dt = benchmark(adam_eq, q0, qd0, goals, iters=3, warmup=0,
                          windows=3).best_s
        gd = bench._final_goal_dist(struct, ee_idx, q0, qd0, eq_us, goals)
        emit({
            "config": f"adam_equal_budget_vs_{label}",
            "n_iters": n_eq,
            "solve_ms": round(eq_dt * 1e3, 2),
            "final_goal_dist_m": round(gd, 4),
        })

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ILQR_H50_r04.json",
    )
    with open(out, "w") as f:
        json.dump({"rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
