"""On-chip throughput/latency for the MPPI (sampling) torque-space MPC.

Two regimes:
- FLEET: B scenarios x K samples — B*K forward-dynamics rollouts per
  iteration in one jitted program (the TPU-native selling point: the
  sample axis is just more batch lanes).
- REPLAN: B=1, K samples — single-robot replan latency (the real-time
  control question; compare benchmarks/latency.py's gradient-MPC rows).

Emits one JSON line per configuration; run on the TPU chip.

Usage: python benchmarks/mppi.py [--H 50] [--iters 10] [--out FILE]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--H", type=int, default=50)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--rollout-impl", default="auto", choices=("auto", "scan", "pallas"),
        help="replan-regime rollout engine (auto = fused Pallas kernel on "
        "TPU). The fleet regime stays on the scan path: it vmaps the "
        "per-scenario solve, and a vmapped kernel call pads every "
        "scenario's K samples to a full 1024-lane tile separately.",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import differentiable_robot_model_tpu as drm
    from differentiable_robot_model_tpu.ops import kinematics as K
    from differentiable_robot_model_tpu.trajopt.solvers import (
        solve_dynamic_mppi,
        solve_dynamic_mppi_batch,
    )
    from differentiable_robot_model_tpu.utils.profiling import benchmark

    struct = drm.DifferentiableKUKAiiwa().struct
    ee = struct.link_index("iiwa_link_ee")
    rng = np.random.default_rng(0)
    lo = np.asarray(struct.limit_lower, np.float32)
    hi = np.asarray(struct.limit_upper, np.float32)

    out_lines = [json.dumps({"backend": jax.default_backend(),
                             "H": args.H, "iters": args.iters})]
    print(out_lines[-1], flush=True)

    def emit(d):
        line = json.dumps(d)
        print(line, flush=True)
        out_lines.append(line)

    # fleet regime — same-process engine A/B (tunnel variance on ~10 ms
    # workloads is up to ~1.5x across processes): the vmapped per-iteration
    # pallas engine vs the whole-solve MPPI kernel ("fused",
    # ops/pallas/solver.py — the ENTIRE sampling loop in one launch,
    # round-4 verdict #2's measurement demand).
    fleet_engines = (
        ("pallas", "fused") if jax.default_backend() == "tpu" else ("scan",)
    )
    for B, Ksamp in ((64, 128), (256, 128), (1024, 64)):
        q0 = jnp.asarray(rng.uniform(0.4 * lo, 0.4 * hi, (B, 7)), jnp.float32)
        qd0 = jnp.zeros((B, 7), jnp.float32)
        qg = jnp.asarray(rng.uniform(0.5 * lo, 0.5 * hi, (B, 7)), jnp.float32)
        goals = jax.vmap(lambda q: K.fk_world(struct, q)[1][ee])(qg)
        key = jax.random.key(1)
        for impl_f in fleet_engines:
            fn = jax.jit(
                lambda q, qd, g, k, Ks=Ksamp, im=impl_f:
                solve_dynamic_mppi_batch(
                    struct, q, qd, g, ee, horizon=args.H, key=k,
                    n_samples=Ks, n_iters=args.iters, rollout_impl=im,
                ).actions
            )
            res = benchmark(fn, q0, qd0, goals, key, iters=3, warmup=1,
                            windows=3)
            dt = res.best_s
            emit({
                "regime": "fleet", "B": B, "n_samples": Ksamp,
                "rollout_impl": impl_f,
                "solve_batch_ms": round(dt * 1e3, 2),
                "solves_per_s": round(B / dt, 1),
                "fd_rollouts_per_s": round(B * Ksamp * args.iters / dt, 1),
            })

    # replan-latency regime
    impl = args.rollout_impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "scan"
    q0 = jnp.asarray(rng.uniform(0.4 * lo, 0.4 * hi, (7,)), jnp.float32)
    goal = K.fk_world(struct, q0)[1][ee] + jnp.asarray([0.05, 0.05, -0.05])
    # Two pipeline depths per config: 10-deep (a control loop that only
    # tolerates a short dispatch queue) and 100-deep (steady-state
    # deployment where the host streams replans). The difference is pure
    # measurement infrastructure: each timing window pays one ~25 ms
    # dev-tunnel sync, so a 10-deep window smears +2.5 ms/call onto the
    # true per-replan cost — the deep number is the chip's.
    for Ksamp in (128, 256, 512):
        fn = jax.jit(lambda q, g, k, Ks=Ksamp: solve_dynamic_mppi(
            struct, q, jnp.zeros(7, jnp.float32), g, ee, horizon=args.H,
            key=k, n_samples=Ks, n_iters=args.iters, rollout_impl=impl,
        ).actions)
        shallow = benchmark(fn, q0, goal, jax.random.key(2), iters=10,
                            warmup=2, windows=3)
        deep = benchmark(fn, q0, goal, jax.random.key(2), iters=100,
                         warmup=2, windows=3)
        emit({
            "regime": "replan", "B": 1, "n_samples": Ksamp,
            "rollout_impl": impl,
            "replan_ms": round(shallow.best_s * 1e3, 3),
            "replan_hz": round(1.0 / shallow.best_s, 1),
            "replan_ms_pipelined": round(deep.best_s * 1e3, 3),
            "replan_hz_pipelined": round(1.0 / deep.best_s, 1),
        })

    # replan-floor decomposition: replan_ms(H, n_iters) at K=128, measured
    # 100-deep so the per-window tunnel sync doesn't drown the signal.
    # Each MPPI iteration is one fused-rollout launch whose H integration
    # steps are SEQUENTIAL (in-kernel latency, not throughput); n_iters=0
    # isolates dispatch + setup + the final nominal-cost rollout. The
    # per-iteration cost is a LEAST-SQUARES slope over the whole n_iters
    # grid, extended until the signal (total slope * grid span) exceeds the
    # inter-window jitter — the round-3 two-point fit (ms[10]-ms[1])/9 put
    # ~0.15 ms of signal under ~0.5 ms of jitter and emitted physically
    # negative per-iteration latencies (advisor finding, MPPI_r03.json).
    # When even the extended grid leaves the slope within noise, the fit is
    # FLAGGED rather than reported as a measured floor.
    iter_grid = (0, 1, 2, 5, 10, 20, 50, 100)
    for Hf in (20, 50):
        ms = {}
        for ni in iter_grid:
            fn = jax.jit(lambda q, g, k, n=ni, h=Hf: solve_dynamic_mppi(
                struct, q, jnp.zeros(7, jnp.float32), g, ee, horizon=h,
                key=k, n_samples=128, n_iters=n, rollout_impl=impl,
            ).actions)
            res = benchmark(fn, q0, goal, jax.random.key(2), iters=100,
                            warmup=2, windows=3)
            ms[ni] = res.best_s * 1e3
            emit({
                "regime": "replan_floor", "H": Hf, "n_samples": 128,
                "n_iters": ni, "replan_ms": round(ms[ni], 3),
                "replan_hz": round(1e3 / ms[ni], 1),
            })
        # least-squares y = a + b*n over the n_iters >= 1 rows (n=0 is a
        # different program shape: no solver scan at all)
        xs = np.asarray([n for n in iter_grid if n >= 1], np.float64)
        ys = np.asarray([ms[n] for n in iter_grid if n >= 1], np.float64)
        A = np.stack([np.ones_like(xs), xs], axis=1)
        (a_fit, b_fit), res_ss, _, _ = np.linalg.lstsq(A, ys, rcond=None)
        dof = max(1, len(xs) - 2)
        resid_std = float(np.sqrt(res_ss[0] / dof)) if res_ss.size else 0.0
        # stderr of the slope under iid residuals
        sxx = float(np.sum((xs - xs.mean()) ** 2))
        b_stderr = resid_std / np.sqrt(sxx) if sxx > 0 else float("inf")
        within_noise = bool(b_fit <= 2.0 * b_stderr)
        fit = {
            "regime": "replan_floor_fit", "H": Hf, "n_samples": 128,
            "dispatch_setup_final_ms": round(ms[0], 3),
            "fit_intercept_ms": round(float(a_fit), 3),
            "per_iteration_ms": round(float(b_fit), 4),
            "per_iteration_ms_stderr": round(float(b_stderr), 4),
            "slope_within_noise": within_noise,
        }
        if not within_noise:
            fit["per_fd_step_us"] = round(1e3 * float(b_fit) / Hf, 2)
        emit(fit)

    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(out_lines) + "\n")


if __name__ == "__main__":
    main()
