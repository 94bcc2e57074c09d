"""On-chip smoke + microbench for the whole-solve fused kernel.

Usage: python tools/smoke_fused_solver.py [H] [ITERS] [B...]
Compares solve_dynamic_adam_batch(rollout_impl="fused") against the
per-iteration "pallas" path and the "scan" path (actions parity), then
times all three per batch size.
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

from differentiable_robot_model_tpu import DifferentiableKUKAiiwa
from differentiable_robot_model_tpu.ops.kinematics import fk_link_position_dof_first
from differentiable_robot_model_tpu.trajopt.solvers import solve_dynamic_adam_batch

H = int(sys.argv[1]) if len(sys.argv) > 1 else 10
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
BATCHES = [int(b) for b in sys.argv[3:]] or [64]

s = DifferentiableKUKAiiwa().struct
ee = s.link_index("iiwa_link_ee")
kw = dict(horizon=H, dt=0.02, n_iters=ITERS, lr=0.5, eps=1e-1)


def solver(impl):
    return jax.jit(
        lambda a, b, c: solve_dynamic_adam_batch(
            s, a, b, c, ee, rollout_impl=impl, **kw
        ).actions
    )


def data(B):
    rng = np.random.default_rng(7)
    q0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 7)), jnp.float32)
    qd0 = jnp.zeros((B, 7), jnp.float32)
    qg = jnp.asarray(rng.uniform(-0.7, 0.7, (B, 7)), jnp.float32)
    goals = jax.vmap(lambda x: fk_link_position_dof_first(s, x[:, None], ee)[:, 0])(qg)
    return q0, qd0, goals


def bench(fn, args, reps=20):
    fn(*args)[0].block_until_ready()
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
    for impl in ("fused", "pallas", "scan"):
        t0 = time.perf_counter()
        outs[impl] = np.asarray(solver(impl)(*args))
        print(f"B={B} {impl}: first call {time.perf_counter()-t0:.1f}s", flush=True)
    err_fp = float(np.max(np.abs(outs["fused"] - outs["pallas"])))
    err_fs = float(np.max(np.abs(outs["fused"] - outs["scan"])))
    print(f"B={B} actions err fused-vs-pallas {err_fp:.3e} fused-vs-scan {err_fs:.3e}")
    for impl in ("fused", "pallas", "scan"):
        ms = bench(solver(impl), args)
        print(
            f"B={B} {impl}: {ms:.3f} ms/solve-batch = {B/ms*1e3:,.0f} solves/s",
            flush=True,
        )
