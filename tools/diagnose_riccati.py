"""Diagnose the sequential-vs-parallel Riccati cost fork (round-2 verdict).

ILQR_r02.json showed the two backward passes converging to mean costs 29%
apart at B=64 on identical inputs (sequential 241.70 vs parallel 172.10).
This tool instruments one iLQR run per method on the same iiwa torque-space
plant as benchmarks/ilqr.py and records, per iteration and per scenario:

- whether the Riccati gains contain NaN/Inf (the sequential recursion
  Cholesky-factorizes Quu; an indefinite Quu yields NaN gains and the NaN
  poisons every earlier stage of the reverse scan, wasting the iteration —
  the parallel path's LU solves stay finite on indefinite blocks),
- the accepted line-search alpha (argmin over the 6-candidate rollouts),
- whether the iteration improved the incumbent,
- the Levenberg-Marquardt lambda after adaptation,
- the incumbent cost.

Emits JSON lines; run on TPU (default backend) or --cpu with
XLA_FLAGS=--xla_disable_hlo_passes=fusion.

Usage: python tools/diagnose_riccati.py [--B 64] [--horizon 30] [--iters 5]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--horizon", type=int, default=30)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--cholesky", action="store_true",
        help="use the PRE-round-3-fix cho_factor gains in the sequential "
        "path (reproduces the NaN-poisoning failure this tool diagnosed)",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    use_cholesky = args.cholesky

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/drm_tpu_jax_cache")
    import jax.numpy as jnp

    import differentiable_robot_model_tpu as drm
    from differentiable_robot_model_tpu.ops import kinematics as K
    from differentiable_robot_model_tpu.ops.dynamics_scalar import rnea_scalar
    from differentiable_robot_model_tpu.trajopt.rollout import (
        fd_step_implicit_damping,
    )
    from differentiable_robot_model_tpu.trajopt import solvers as S

    struct = drm.DifferentiableKUKAiiwa().struct
    ee = struct.link_index("iiwa_link_ee")
    D = struct.n_dofs
    H, B = args.horizon, args.B
    dt = 0.02
    goal = jnp.asarray([0.45, 0.15, 0.65], jnp.float32)

    def dynamics(x, u):
        q, qd = x[:D], x[D:]
        qdd = fd_step_implicit_damping(struct, q, qd, u, dt)
        qd2 = qd + dt * qdd
        return jnp.concatenate([q + dt * qd2, qd2])

    def cost(x, u):
        p = K.fk_link_position(struct, x[:D], ee)
        return 10.0 * jnp.sum((p - goal) ** 2) + 1e-4 * jnp.sum(u * u)

    def final_cost(x):
        p = K.fk_link_position(struct, x[:D], ee)
        return 100.0 * jnp.sum((p - goal) ** 2)

    # Same scenario draw as benchmarks/ilqr.py
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.uniform(-0.4, 0.4, (B, D)), jnp.float32)
    x0s = jnp.concatenate([q0, jnp.zeros((B, D), jnp.float32)], axis=1)
    tau_ref = rnea_scalar(struct, q0.T, 0.0 * q0.T, 0.0 * q0.T).T
    us0 = jnp.tile(tau_ref[:, None, :], (1, H, 1))

    n, m = 2 * D, D
    f_x = jax.vmap(jax.jacobian(dynamics, argnums=0))
    f_u = jax.vmap(jax.jacobian(dynamics, argnums=1))
    c_x = jax.vmap(jax.grad(cost, argnums=0))
    c_u = jax.vmap(jax.grad(cost, argnums=1))
    c_xx = jax.vmap(jax.hessian(cost, argnums=0))
    c_uu = jax.vmap(jax.hessian(cost, argnums=1))
    c_ux = jax.vmap(jax.jacobian(jax.grad(cost, argnums=1), argnums=0))
    alphas = jnp.asarray((1.0, 0.5, 0.25, 0.1, 0.03, 0.01), jnp.float32)

    def derivs(xs, us):
        return (f_x(xs[:-1], us), f_u(xs[:-1], us), c_x(xs[:-1], us),
                c_u(xs[:-1], us), c_xx(xs[:-1], us), c_uu(xs[:-1], us),
                c_ux(xs[:-1], us), jax.grad(final_cost)(xs[-1]),
                jax.hessian(final_cost)(xs[-1]))

    def seq_gains(A, Bm, lx, lu, lxx, luu, lux, Vx, Vxx, lam):
        """Verbatim re-derivation of solvers.ilqr's sequential bstep (kept in
        sync with solvers.py:893-912) so gains can be inspected mid-run."""
        def bstep(carry, inp):
            Vx, Vxx = carry
            A_t, B_t, lx_t, lu_t, lxx_t, luu_t, lux_t = inp
            Qx = lx_t + A_t.T @ Vx
            Qu = lu_t + B_t.T @ Vx
            Qxx = lxx_t + A_t.T @ Vxx @ A_t
            Quu = luu_t + B_t.T @ Vxx @ B_t + lam * jnp.eye(m, dtype=A_t.dtype)
            Qux = lux_t + B_t.T @ Vxx @ A_t
            # LU solve, matching the round-3 fix in solvers.py (pass
            # --cholesky to reproduce the pre-fix NaN-poisoning behavior)
            if use_cholesky:
                chol = jax.scipy.linalg.cho_factor(Quu)
                k = -jax.scipy.linalg.cho_solve(chol, Qu)
                Kmat = -jax.scipy.linalg.cho_solve(chol, Qux)
            else:
                k = -jnp.linalg.solve(Quu, Qu[..., None])[..., 0]
                Kmat = -jnp.linalg.solve(Quu, Qux)
            Vx_new = Qx + Kmat.T @ Quu @ k + Kmat.T @ Qu + Qux.T @ k
            Vxx_new = Qxx + Kmat.T @ Quu @ Kmat + Kmat.T @ Qux + Qux.T @ Kmat
            Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
            # min eig of the UNregularized Quu (indefiniteness detector)
            eigs = jnp.linalg.eigvalsh(Quu - lam * jnp.eye(m, dtype=A_t.dtype))
            return (Vx_new, Vxx_new), (k, Kmat, eigs[0])

        _, (ks, Ks, mineig) = jax.lax.scan(
            bstep, (Vx, Vxx), (A, Bm, lx, lu, lxx, luu, lux), reverse=True
        )
        return ks, Ks, mineig

    def par_gains(A, Bm, lx, lu, lxx, luu, lux, Vx, Vxx, lam):
        luu_reg = luu + lam * jnp.eye(m, dtype=A.dtype)
        ks, Ks = S._parallel_riccati_gains(
            A, Bm, lx, lu, lxx, luu_reg, lux, Vx, Vxx
        )
        return ks, Ks, jnp.zeros(ks.shape[0], ks.dtype)

    def forward(xs, us, ks, Ks, alpha, x0):
        def fstep(x, inp):
            x_ref, u_ref, k_t, K_t = inp
            u = u_ref + alpha * k_t + K_t @ (x - x_ref)
            x_next = dynamics(x, u)
            return x_next, (x_next, u)

        _, (xs_tail, us_new) = jax.lax.scan(fstep, x0, (xs[:-1], us, ks, Ks))
        xs_new = jnp.concatenate([x0[None], xs_tail], axis=0)
        return xs_new, us_new, S._total_cost(cost, final_cost, xs_new, us_new)

    def make_iteration(gains_fn):
        def iteration(xs, us, best_cost, lam, x0):
            A, Bm, lx, lu, lxx, luu, lux, Vx, Vxx = derivs(xs, us)
            ks, Ks, mineig = gains_fn(A, Bm, lx, lu, lxx, luu, lux, Vx, Vxx, lam)
            gains_bad = jnp.logical_not(
                jnp.all(jnp.isfinite(ks)) & jnp.all(jnp.isfinite(Ks))
            )
            xs_c, us_c, costs_c = jax.vmap(
                lambda a: forward(xs, us, ks, Ks, a, x0)
            )(alphas)
            costs_c = jnp.where(jnp.isnan(costs_c), jnp.inf, costs_c)
            best = jnp.argmin(costs_c)
            improved = costs_c[best] < best_cost
            xs = jnp.where(improved, xs_c[best], xs)
            us = jnp.where(improved, us_c[best], us)
            new_cost = jnp.where(improved, costs_c[best], best_cost)
            lam = jnp.where(
                improved, jnp.maximum(lam * 0.5, 1e-6),
                jnp.minimum(lam * 10.0, 1e8),
            )
            diag = dict(
                gains_bad=gains_bad, alpha=alphas[best], improved=improved,
                lam=lam, cost=new_cost, min_eig_quu=jnp.min(mineig),
            )
            return xs, us, new_cost, lam, diag

        return jax.jit(jax.vmap(iteration, in_axes=(0, 0, 0, 0, 0)))

    results = {}
    for name, gains_fn in (("sequential", seq_gains), ("parallel", par_gains)):
        it = make_iteration(gains_fn)
        xs = jax.vmap(lambda x0, us: S._rollout(dynamics, x0, us))(x0s, us0)
        us = us0
        c = jax.vmap(lambda xs_b, us_b: S._total_cost(cost, final_cost, xs_b, us_b))(xs, us)
        lam = jnp.full((B,), 1e-3, jnp.float32)
        trace = []
        for i in range(args.iters):
            xs, us, c, lam, diag = it(xs, us, c, lam, x0s)
            d = {k: np.asarray(v) for k, v in diag.items()}
            row = {
                "method": name, "iter": i,
                "frac_gains_bad": float(d["gains_bad"].mean()),
                "frac_improved": float(d["improved"].mean()),
                "mean_alpha_accepted": float(
                    np.where(d["improved"], d["alpha"], np.nan)[
                        d["improved"].astype(bool)
                    ].mean()
                ) if d["improved"].any() else None,
                "mean_lam": float(d["lam"].mean()),
                "mean_cost": float(d["cost"].mean()),
                "min_eig_quu_min": float(d["min_eig_quu"].min()),
                "frac_quu_indefinite": float((d["min_eig_quu"] < 0).mean()),
            }
            trace.append(row)
            print(json.dumps(row), flush=True)
        results[name] = trace

    summary = {
        "B": B, "H": H, "iters": args.iters,
        "final_mean_cost_sequential": results["sequential"][-1]["mean_cost"],
        "final_mean_cost_parallel": results["parallel"][-1]["mean_cost"],
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"trace": results, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
