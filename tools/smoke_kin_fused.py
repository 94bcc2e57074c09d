"""On-chip smoke + microbench for the kinematic whole-solve kernel.

Usage: python tools/smoke_kin_fused.py [H] [ITERS] [B...]
Parity + timing of solve_kinematic_adam_batch fk_impl in
{fused, pallas, scalar}.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/drm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import differentiable_robot_model_tpu as drm
from differentiable_robot_model_tpu.trajopt.solvers import solve_kinematic_adam_batch

H = int(sys.argv[1]) if len(sys.argv) > 1 else 50
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
BATCHES = [int(b) for b in sys.argv[3:]] or [4096]

robot = drm.DifferentiableKUKAiiwa()
s = robot.struct
ee = s.link_index("iiwa_link_ee")
kw = dict(horizon=H, n_iters=ITERS, lr=0.05, eps=1.0)


def solver(impl):
    return jax.jit(
        lambda a, c: solve_kinematic_adam_batch(
            s, a, c, ee, fk_impl=impl, **kw
        ).actions
    )


def data(B):
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 7)), jnp.float32)
    qg = jnp.asarray(rng.uniform(-0.8, 0.8, (B, 7)), jnp.float32)
    goals, _ = robot.compute_forward_kinematics(qg, "iiwa_link_ee")
    return q0, jnp.asarray(goals)


def bench(fn, args, reps=20):
    fn(*args).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


for B in BATCHES:
    args = data(B)
    outs = {}
    for impl in ("fused", "pallas"):
        t0 = time.perf_counter()
        outs[impl] = np.asarray(solver(impl)(*args))
        print(f"B={B} {impl}: first call {time.perf_counter()-t0:.1f}s", flush=True)
    d = np.abs(outs["fused"] - outs["pallas"])
    print(
        f"B={B} actions err fused-vs-pallas max {d.max():.3e} "
        f"median-lane {np.median(d.max(axis=(1, 2))):.3e}"
    )
    for impl in ("fused", "pallas"):
        ms = bench(solver(impl), args)
        print(
            f"B={B} {impl}: {ms:.3f} ms/solve-batch = {B/ms*1e3:,.0f} solves/s",
            flush=True,
        )
