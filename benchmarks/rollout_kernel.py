"""Fused Pallas dynamic-rollout kernel vs the lax.scan path.

Measures forward and forward+VJP wall time for the H-step semi-implicit-Euler
forward-dynamics rollout (the dynamic-MPC inner loop) at a grid of batch
sizes, on the current backend. Emits one JSON object with per-row ms,
rollouts/s, speedup, and max abs error of the kernel vs the scan path.

All scan-path graphs are wrapped in a length-1 lax.scan: XLA:TPU compiles the
big rollout graph an order of magnitude faster as a scan body than inlined at
top level (measured in trajopt/solvers.py — 44 s vs ~586 s at B=1024).

Usage: python benchmarks/rollout_kernel.py [--out FILE]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H = 50
DT = 0.02
BATCHES = (1, 1024, 4096, 65536)
# The f64 truth arbiter slices each batch to this many lanes: every lane of
# the dof-major rollout is numerically independent (scalar dynamics, no
# cross-batch contractions), so a slice is exact for the lanes it keeps and
# the CPU-x64 reference stays affordable at B=65536.
ARBITER_LANES = 256


def f64_ref_main(in_path: str, out_path: str) -> None:
    """Subprocess entry: the scan-path VJP in float64 on CPU — the truth
    arbiter for the kernel-vs-scan gradient gap (round-3 verdict item 8)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/drm_tpu_jax_cache")
    import jax.numpy as jnp

    import differentiable_robot_model_tpu as drm
    from differentiable_robot_model_tpu.trajopt.rollout import (
        dynamic_rollout_dof_major,
    )

    s = drm.DifferentiableKUKAiiwa(dtype=jnp.float64).struct
    data = np.load(in_path)
    q0 = jnp.asarray(data["q0"], jnp.float64)
    qd0 = jnp.asarray(data["qd0"], jnp.float64)
    tau = jnp.asarray(data["tau"], jnp.float64)
    g = jax.jit(
        jax.grad(
            lambda t, a, b: jnp.sum(
                jnp.sin(dynamic_rollout_dof_major(s, a, b, t, DT)[0])
            )
        )
    )(tau, q0, qd0)
    np.savez(out_path, grad=np.asarray(g, np.float64))


def _run_f64_ref(q0, qd0, tau):
    tmp = tempfile.mkdtemp(prefix="drm_rollout_f64_")
    in_path = os.path.join(tmp, "in.npz")
    out_path = os.path.join(tmp, "out.npz")
    np.savez(in_path, q0=q0, qd0=qd0, tau=tau)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_disable_hlo_passes" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_disable_hlo_passes=fusion").strip()
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--f64-ref", in_path, out_path],
        check=True, env=env,
    )
    return np.load(out_path)["grad"]


def main(out_path=None):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/drm_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import differentiable_robot_model_tpu as drm
    from differentiable_robot_model_tpu.ops.pallas.rollout import (
        dynamic_rollout_pallas,
    )
    from differentiable_robot_model_tpu.trajopt.rollout import (
        dynamic_rollout_dof_major,
    )
    from differentiable_robot_model_tpu.utils.profiling import benchmark

    s = drm.DifferentiableKUKAiiwa().struct
    D = s.n_dofs
    rng = np.random.default_rng(0)

    def scan1(f):
        # length-1 scan wrapper (compile-time trick, see module docstring)
        return lambda *args: jax.lax.scan(
            lambda _, x: (None, f(*x)), None, tuple(a[None] for a in args)
        )[1][0]

    k_fwd = jax.jit(lambda a, b, t: dynamic_rollout_pallas(s, a, b, t, DT)[0])
    r_fwd = jax.jit(
        scan1(lambda a, b, t: dynamic_rollout_dof_major(s, a, b, t, DT)[0])
    )
    k_vjp = jax.jit(
        jax.grad(
            lambda t, a, b: jnp.sum(
                jnp.sin(dynamic_rollout_pallas(s, a, b, t, DT)[0])
            )
        )
    )
    r_vjp = jax.jit(
        scan1(
            jax.grad(
                lambda t, a, b: jnp.sum(
                    jnp.sin(dynamic_rollout_dof_major(s, a, b, t, DT)[0])
                )
            )
        )
    )

    from benchmarks.dynamics_ops import _cost_analysis, _io_bytes, _roofline

    rows = []
    for B in BATCHES:
        q0 = jnp.asarray(rng.uniform(-0.5, 0.5, (D, B)), jnp.float32)
        qd0 = jnp.asarray(rng.uniform(-0.2, 0.2, (D, B)), jnp.float32)
        tau = jnp.asarray(rng.uniform(-3, 3, (H, D, B)), jnp.float32)
        reps = max(3, min(30, (1 << 22) // max(B, 1)))

        t0 = time.time()
        ok = k_fwd(q0, qd0, tau)
        jax.block_until_ready(ok)
        k_compile_s = time.time() - t0
        orr = r_fwd(q0, qd0, tau)
        jax.block_until_ready(orr)
        err = float(jnp.max(jnp.abs(ok - orr)))

        tk = benchmark(k_fwd, q0, qd0, tau, iters=reps, warmup=1, windows=3).best_s
        tr = benchmark(r_fwd, q0, qd0, tau, iters=reps, warmup=1, windows=3).best_s
        # Roofline: the kernel is an opaque custom call to XLA, so its flop
        # count is borrowed from the scan twin (identical step math).
        ca = _cost_analysis(r_fwd, (q0, qd0, tau))
        row = {
            "op": "rollout_fwd", "B": B, "H": H,
            "kernel_ms": round(tk * 1e3, 3), "scan_ms": round(tr * 1e3, 3),
            "speedup": round(tr / tk, 2),
            "kernel_rollouts_per_s": round(B / tk, 1),
            "max_abs_err": err,
            "kernel_compile_s": round(k_compile_s, 1),
        }
        _roofline(row, tk, flops=ca["flops"] if ca else 0, hbm_bytes=0,
                  io_bytes=_io_bytes((q0, qd0, tau), [ok, ok]))
        rows.append(row)
        print(json.dumps(rows[-1]), flush=True)

        gk = k_vjp(tau, q0, qd0)
        jax.block_until_ready(gk)
        gr = r_vjp(tau, q0, qd0)
        jax.block_until_ready(gr)
        gerr = float(jnp.max(jnp.abs(gk - gr)))
        tk = benchmark(k_vjp, tau, q0, qd0, iters=reps, warmup=1, windows=3).best_s
        tr = benchmark(r_vjp, tau, q0, qd0, iters=reps, warmup=1, windows=3).best_s
        ca = _cost_analysis(r_vjp, (tau, q0, qd0))
        gscale = max(1.0, float(jnp.max(jnp.abs(gr))))
        row = {
            "op": "rollout_fwd+vjp", "B": B, "H": H,
            "kernel_ms": round(tk * 1e3, 3), "scan_ms": round(tr * 1e3, 3),
            "speedup": round(tr / tk, 2),
            "kernel_rollouts_per_s": round(B / tk, 1),
            "max_abs_grad_err": gerr,
            "max_rel_grad_err": gerr / gscale,
        }
        # f64 truth arbiter (round-3 verdict item 8): which f32 gradient —
        # kernel or scan — is closer to the float64 scan run on the SAME
        # lanes? Lanes are numerically independent, so gathering a lane
        # subset is exact — and the subset taken is the nl lanes where
        # kernel and scan DISAGREE MOST, so the arbiter rules on the
        # worst-case discrepancy rather than a fixed sample that might
        # miss it.
        nl = min(B, ARBITER_LANES)
        try:
            gk_np = np.asarray(gk, np.float64)
            gr_np = np.asarray(gr, np.float64)
            disc = np.max(np.abs(gk_np - gr_np), axis=(0, 1))  # [B]
            idx = np.argsort(disc)[-nl:]
            g64 = _run_f64_ref(
                np.asarray(q0, np.float64)[:, idx],
                np.asarray(qd0, np.float64)[:, idx],
                np.asarray(tau, np.float64)[:, :, idx],
            )
            g64s = max(1.0, float(np.max(np.abs(g64))))
            row["arbiter_lanes"] = nl
            row["arbiter_selection"] = "top-disagreement"
            row["kernel_vs_f64_max_rel_err"] = float(
                np.max(np.abs(gk_np[:, :, idx] - g64))
            ) / g64s
            row["scan_vs_f64_max_rel_err"] = float(
                np.max(np.abs(gr_np[:, :, idx] - g64))
            ) / g64s
        except Exception as e:  # arbiter is advisory; keep the perf row
            row["arbiter_error"] = repr(e)
        _roofline(row, tk, flops=ca["flops"] if ca else 0, hbm_bytes=0,
                  io_bytes=_io_bytes((tau, q0, qd0), [gk]))
        rows.append(row)
        print(json.dumps(rows[-1]), flush=True)

    out = {"backend": jax.default_backend(), "robot": "iiwa7", "rows": rows}
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1)
    return out


if __name__ == "__main__":
    if len(sys.argv) == 4 and sys.argv[1] == "--f64-ref":
        f64_ref_main(sys.argv[2], sys.argv[3])
    else:
        ap = argparse.ArgumentParser()
        ap.add_argument("--out", default=None)
        main(ap.parse_args().out)
