"""Diagnose the iLQR cross-backend parity failure (round-3 verdict item 1).

`BENCH_r03.json` recorded `ilqr_control_seq_max_err_vs_cpu = 1.10` on the
reduced config (B=2, H=10, 3 iters) — a thousand times over the <=1e-3
gate that both Adam paths pass. This tool does for the iLQR driver what
`tools/diagnose_riccati.py` did for the Riccati backward pass: measure,
don't guess.

Three runs of the IDENTICAL reduced-config solve (bit-identical inputs —
q0/goals/us0 all shipped through one npz):

  1. this process's backend (TPU under axon) in float32,
  2. a CPU-subprocess in float32 (fusion disabled, as in bench.py),
  3. a CPU-subprocess in float64 (`jax_enable_x64`) — the truth arbiter.

Each run uses `ilqr(..., diagnostics=True)` so we get, per scenario and
per iteration: the accepted line-search argmin index, every candidate
cost the argmin chose between, the LM lambda, the control iterate, and
the feedforward-gain norm. The comparison then answers, mechanically:

  - At which iteration do TPU and CPU first pick a DIFFERENT alpha?
  - At that flip, what was the relative margin between the two
    candidates on each backend? (a near-tie => ULP-level backend noise
    selects different branches of a discrete argmin; macroscopic control
    divergence follows even though BOTH branches descend)
  - Is either f32 backend "wrong"? — per-iteration cost trajectories of
    each f32 run vs the f64 truth.
  - How big was the us divergence BEFORE the first flip (pure numerics)
    vs after (branch divergence)?

Writes ILQR_DIAG_r04.json. Usage:  python tools/diagnose_ilqr.py
(subprocess modes: --worker <in.npz> <out.npz> [--x64])

Reference anchor: the upstream library's first-order trajopt
(examples/run_kinematic_trajectory_opt.py:88-99) has no second-order
solver and no cross-backend story; this gate is our own north star.
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B_DIAG, H_DIAG, ITERS_DIAG = 2, 10, 3


def _solve_with_diag(x0s, us0, goals, x64=False):
    """Run the reduced-config iLQR solve with diagnostics; returns numpy."""
    import jax.numpy as jnp

    import bench

    struct, ee_idx, _, _ = bench._build_scenarios()
    if x64:
        # Rebuild the struct in float64 (the pytree carries f32 leaves).
        import jax

        struct = jax.tree.map(
            lambda a: a.astype(jnp.float64)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            struct,
        )
    # engine="autodiff": the divergence analysis recorded in
    # ILQR_DIAG_r04.json ran the generic linearization; keep the tool on
    # that lineage (bench.py's throughput/parity rows default to gn_ift).
    solver = bench._ilqr_solver(
        struct, ee_idx, ITERS_DIAG, diagnostics=True, engine="autodiff"
    )
    dt = jnp.float64 if x64 else jnp.float32
    us, diag = solver(
        jnp.asarray(x0s, dt), jnp.asarray(us0, dt), jnp.asarray(goals, dt)
    )
    out = {"us": np.asarray(us, np.float64)}
    for k, v in diag.items():
        out[k] = np.asarray(v, np.float64)
    return out


def worker_main(in_path, out_path, x64):
    import jax

    jax.config.update("jax_platforms", "cpu")
    if x64:
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/drm_tpu_jax_cache")
    data = np.load(in_path)
    out = _solve_with_diag(data["x0s"], data["us0"], data["goals"], x64=x64)
    np.savez(out_path, **out)


def _run_worker(x0s, us0, goals, x64):
    tmp = tempfile.mkdtemp(prefix="drm_ilqr_diag_")
    in_path = os.path.join(tmp, "in.npz")
    out_path = os.path.join(tmp, "out.npz")
    np.savez(in_path, x0s=x0s, us0=us0, goals=goals)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_disable_hlo_passes" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_disable_hlo_passes=fusion").strip()
    cmd = [sys.executable, os.path.abspath(__file__), "--worker", in_path, out_path]
    if x64:
        cmd.append("--x64")
    subprocess.run(cmd, check=True, env=env)
    return dict(np.load(out_path))


def _flip_analysis(a, b, name_a, name_b):
    """Per-scenario: first iteration where the argmin choices differ, and
    the relative tie margin between the two contested candidates on each
    backend at that iteration."""
    rows = []
    for s in range(a["alpha_idx"].shape[0]):
        ia = a["alpha_idx"][s].astype(int)
        ib = b["alpha_idx"][s].astype(int)
        diff_iters = np.nonzero(ia != ib)[0]
        row = {
            "scenario": s,
            f"alpha_idx_{name_a}": ia.tolist(),
            f"alpha_idx_{name_b}": ib.tolist(),
            "first_flip_iter": int(diff_iters[0]) if diff_iters.size else -1,
        }
        if diff_iters.size:
            t = int(diff_iters[0])
            ca, cb = a["ls_costs"][s, t], b["ls_costs"][s, t]
            # Margin between the two contested alpha branches, on each
            # backend, relative to the cost scale.
            m_a = abs(ca[ia[t]] - ca[ib[t]]) / max(abs(ca[ia[t]]), 1e-30)
            m_b = abs(cb[ia[t]] - cb[ib[t]]) / max(abs(cb[ib[t]]), 1e-30)
            row["flip_margin_rel"] = {name_a: float(m_a), name_b: float(m_b)}
            # us divergence the iteration BEFORE the flip = pure numerics.
            if t > 0:
                pre = float(
                    np.max(np.abs(a["us_iter"][s, t - 1] - b["us_iter"][s, t - 1]))
                )
            else:
                pre = 0.0  # identical warm start
            post = float(np.max(np.abs(a["us_iter"][s, t] - b["us_iter"][s, t])))
            row["us_max_diff_before_flip"] = pre
            row["us_max_diff_at_flip"] = post
        row["us_max_diff_final"] = float(np.max(np.abs(a["us"][s] - b["us"][s])))
        # Cost-trajectory parity is flip-immune: both branches of a
        # near-tie descend to near-equal cost.
        last_a = a["ls_costs"][s, -1].min()
        last_b = b["ls_costs"][s, -1].min()
        row["final_cost_rel_diff"] = float(
            abs(last_a - last_b) / max(abs(last_a), 1e-30)
        )
        rows.append(row)
    return rows


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/drm_tpu_jax_cache")
    import jax.numpy as jnp

    import bench

    struct, ee_idx, q0_np, goals_np = bench._build_scenarios()
    q0 = np.asarray(q0_np[:B_DIAG], np.float32)
    goals = np.asarray(goals_np[:B_DIAG], np.float32)
    x0s = np.concatenate([q0, np.zeros_like(q0)], axis=1)
    us0 = np.asarray(
        bench._ilqr_warm_start(struct, jnp.asarray(q0), H_DIAG), np.float32
    )

    backend = jax.default_backend()
    print(f"[diag] local backend: {backend}", file=sys.stderr)
    local = _solve_with_diag(x0s, us0, goals)
    print("[diag] local solve done; launching CPU f32 worker", file=sys.stderr)
    cpu32 = _run_worker(x0s, us0, goals, x64=False)
    print("[diag] CPU f32 done; launching CPU f64 worker", file=sys.stderr)
    cpu64 = _run_worker(x0s, us0, goals, x64=True)

    flips = _flip_analysis(local, cpu32, backend, "cpu_f32")

    # Which f32 backend tracks the f64 truth better, per iteration?
    def cost_traj(d):
        return d["ls_costs"].min(axis=2)  # [B, iters] accepted-candidate cost

    c_loc, c_c32, c_c64 = cost_traj(local), cost_traj(cpu32), cost_traj(cpu64)
    vs_truth = {
        f"{backend}_cost_rel_err_vs_f64": np.abs((c_loc - c_c64) / c_c64)
        .max(axis=0)
        .tolist(),
        "cpu_f32_cost_rel_err_vs_f64": np.abs((c_c32 - c_c64) / c_c64)
        .max(axis=0)
        .tolist(),
        f"{backend}_us_max_err_vs_f64": float(
            np.max(np.abs(local["us"] - cpu64["us"]))
        ),
        "cpu_f32_us_max_err_vs_f64": float(np.max(np.abs(cpu32["us"] - cpu64["us"]))),
        "f64_alpha_idx": cpu64["alpha_idx"].astype(int).tolist(),
    }

    report = {
        "config": {"B": B_DIAG, "H": H_DIAG, "iters": ITERS_DIAG},
        "backend": backend,
        "us_max_err_local_vs_cpu32": float(np.max(np.abs(local["us"] - cpu32["us"]))),
        "flip_analysis": flips,
        "vs_f64_truth": vs_truth,
        "lam_local": local["lam"].tolist(),
        "lam_cpu32": cpu32["lam"].tolist(),
        "k_norm_local": local["k_norm"].tolist(),
        "k_norm_cpu32": cpu32["k_norm"].tolist(),
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ILQR_DIAG_r04.json",
    )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker_main(sys.argv[i + 1], sys.argv[i + 2], "--x64" in sys.argv)
    else:
        main()
