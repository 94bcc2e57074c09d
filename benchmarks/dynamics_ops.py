"""Dynamics-op throughput bake-off on the real chip: scalar-XLA vs Pallas.

SURVEY.md §7 step 4 prescribes measuring each hot op both ways and keeping
the winner per shape; VERDICT round 1 required recording the table (the
Pallas RNEA kernel was built and tested but never measured on hardware).

Measures, at several batch sizes, pipelined throughput (dispatch a stream,
block once — per-call blocking would measure the ~25 ms dev-tunnel
roundtrip; see utils/profiling.py):

- ID  (inverse dynamics): vmapped scalar RNEA [B,D] vs fused Pallas kernel
- FK  (one link's world position): scalar chain FK vs fused Pallas kernel
- H   (mass matrix): vmapped scalar CRB (no Pallas variant — all-elementwise)
- FD  (forward dynamics): vmapped scalar CRB+LDL (no Pallas variant)
- ID/FD dof-major trailing-batch [D,B] variants (the MPC-solver layout)

Emits one JSON line per row plus a summary object; run on the TPU to
populate the BASELINE.md dynamics-ops table:

    python benchmarks/dynamics_ops.py [--out DYNOPS.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _throughput(fn, args, reps=20, windows=3):
    """Best-of-windows pipelined timing via the package's canonical timer
    (utils/profiling.benchmark); warmup=1 pays the compile outside timing."""
    from differentiable_robot_model_tpu.utils.profiling import benchmark

    return benchmark(fn, *args, iters=reps, warmup=1, windows=windows).best_s


# TPU v5e single-chip peaks (public spec): 197 TFLOP/s bf16 on the MXU,
# 819 GB/s HBM bandwidth. The scalar dynamics recursions are fp32 VPU
# code, so "% of peak" against the MXU number is intentionally the harsh
# denominator — it is the roofline argument for WHY these ops are
# latency-/VPU-bound rather than a claim they could hit it.
V5E_PEAK_FLOPS = 197e12
V5E_PEAK_BYTES = 819e9


def _cost_analysis(fn, args):
    """XLA's flop/byte estimate for the jitted fn at these shapes, or None.

    Pallas kernels are opaque custom calls to XLA (their flops report as 0),
    so callers pass the SCALAR twin here and attach its analytic flop count
    to the kernel row — same math, same flops (ops/pallas/*.py docstrings).
    """
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {
            "flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0)),
        }
    except Exception:
        return None


def _io_bytes(args, outs):
    import jax

    total = 0
    for x in list(args) + list(outs):
        for leaf in jax.tree_util.tree_leaves(x):
            total += leaf.size * leaf.dtype.itemsize
    return total


def _roofline(row, dt, flops, hbm_bytes, io_bytes):
    """Attach achieved GFLOP/s, GB/s and %-of-v5e-peak columns to a row."""
    if flops:
        row["gflops_est"] = round(flops / 1e9, 3)
        row["achieved_gflops_per_s"] = round(flops / dt / 1e9, 1)
        row["pct_peak_flops"] = round(100.0 * flops / dt / V5E_PEAK_FLOPS, 3)
    if hbm_bytes:
        row["xla_bytes_est"] = int(hbm_bytes)
        row["achieved_gb_per_s_xla"] = round(hbm_bytes / dt / 1e9, 1)
        row["pct_peak_bw_xla"] = round(100.0 * hbm_bytes / dt / V5E_PEAK_BYTES, 3)
    if io_bytes:
        row["io_bytes"] = int(io_bytes)
        row["achieved_gb_per_s_io"] = round(io_bytes / dt / 1e9, 1)
    if flops and io_bytes:
        row["arithmetic_intensity_io"] = round(flops / io_bytes, 2)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--batches", default="1024,4096,8192,16384,65536")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import differentiable_robot_model_tpu as drm
    from differentiable_robot_model_tpu.ops.dynamics_scalar import (
        forward_dynamics_scalar,
        mass_matrix_scalar,
        rnea_scalar,
    )
    from differentiable_robot_model_tpu.ops.kinematics import (
        fk_link_position,
        fk_link_position_dof_first,
    )
    from differentiable_robot_model_tpu.ops.pallas.fk import (
        fk_link_position_pallas,
        fk_position_dof_major,
    )
    from differentiable_robot_model_tpu.ops.pallas.rnea import rnea_pallas

    backend = jax.default_backend()
    struct = drm.DifferentiableKUKAiiwa().struct
    ee = struct.link_index("iiwa_link_ee")
    rows = []

    for B in [int(x) for x in args.batches.split(",")]:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.uniform(-1, 1, (B, 7)), jnp.float32)
        qd = jnp.asarray(rng.uniform(-1, 1, (B, 7)), jnp.float32)
        qdd = jnp.asarray(rng.uniform(-1, 1, (B, 7)), jnp.float32)
        qT, qdT, qddT = q.T, qd.T, qdd.T

        cases = {
            "id_scalar_vmap": (
                jax.jit(lambda a, b, c: jax.vmap(
                    lambda x, y, z: rnea_scalar(struct, x, y, z))(a, b, c)),
                (q, qd, qdd),
            ),
            "id_scalar_dof_major": (
                jax.jit(lambda a, b, c: rnea_scalar(struct, a, b, c)),
                (qT, qdT, qddT),
            ),
            "id_pallas": (
                jax.jit(lambda a, b, c: rnea_pallas(struct, a, b, c)),
                (q, qd, qdd),
            ),
            "fk_scalar": (
                jax.jit(lambda a: fk_link_position(struct, a, ee)),
                (q,),
            ),
            "fk_scalar_dof_major": (
                jax.jit(lambda a: fk_link_position_dof_first(struct, a, ee)),
                (qT,),
            ),
            "fk_pallas": (
                jax.jit(lambda a: fk_link_position_pallas(struct, a, ee)),
                (q,),
            ),
            "fk_pallas_dof_major": (
                jax.jit(lambda a: fk_position_dof_major(struct, a, ee)),
                (qT,),
            ),
            "h_scalar_vmap": (
                jax.jit(lambda a: jax.vmap(
                    lambda x: mass_matrix_scalar(struct, x))(a)),
                (q,),
            ),
            "h_scalar_dof_major": (
                jax.jit(lambda a: mass_matrix_scalar(struct, a)),
                (qT,),
            ),
            "fd_scalar_vmap": (
                jax.jit(lambda a, b, c: jax.vmap(
                    lambda x, y, z: forward_dynamics_scalar(struct, x, y, z))(a, b, c)),
                (q, qd, qdd),
            ),
            "fd_scalar_dof_major": (
                jax.jit(lambda a, b, c: forward_dynamics_scalar(struct, a, b, c)),
                (qT, qdT, qddT),
            ),
        }
        if backend != "tpu":
            # Pallas kernels need the chip (or interpret mode, which is not
            # a performance measurement) — skip them off-TPU.
            cases = {k: v for k, v in cases.items() if "pallas" not in k}

        # Pallas kernels are opaque custom calls (XLA reports 0 flops), so
        # each kernel row borrows its ANALYTIC flop count from the scalar
        # twin computing the same math.
        flops_src = {
            "id_pallas": "id_scalar_dof_major",
            "fk_pallas": "fk_scalar_dof_major",
            "fk_pallas_dof_major": "fk_scalar_dof_major",
        }
        analyses = {
            name: _cost_analysis(fn, a)
            for name, (fn, a) in cases.items()
            if "pallas" not in name
        }

        for name, (fn, a) in cases.items():
            try:
                dt = _throughput(fn, a, reps=args.reps)
            except Exception as exc:  # record the failure, keep the sweep
                rows.append({"op": name, "B": B, "error": str(exc)[:200]})
                continue
            row = {
                "op": name,
                "B": B,
                "ms": round(dt * 1e3, 4),
                "configs_per_s": round(B / dt, 1),
            }
            ca = analyses.get(flops_src.get(name, name))
            outs = jax.tree_util.tree_leaves(fn(*a))
            _roofline(
                row, dt,
                flops=ca["flops"] if ca else 0,
                # XLA's traffic estimate only describes the graph it
                # analyzed — meaningless for the opaque kernel rows.
                hbm_bytes=(ca["bytes"] if ca and "pallas" not in name else 0),
                io_bytes=_io_bytes(a, outs),
            )
            rows.append(row)
            print(json.dumps(row), flush=True)

    summary = {"backend": backend, "robot": "iiwa7", "rows": rows}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
    print(json.dumps({"metric": "dynamics_ops_bakeoff", "backend": backend,
                      "n_rows": len(rows)}))


if __name__ == "__main__":
    sys.exit(main())
