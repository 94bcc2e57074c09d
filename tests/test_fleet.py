"""Heterogeneous fleet: one jitted program serves every robot.

Validates the data-driven-topology path (models/fleet.py) against the
static-topology path for each fleet member, including branched trees and
prismatic joints, plus the one-program property (a single jit handles all
robots through the same traced code).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from differentiable_robot_model_tpu import (
    DifferentiableFetchArm,
    DifferentiableFrankaPanda,
    DifferentiableKUKAiiwa,
    DifferentiableTrifingerEdu,
    DifferentiableTwoLinkRobot,
)
from differentiable_robot_model_tpu.models.fleet import (
    build_fleet,
    ee_jacobian_fleet,
    ee_position_fleet,
    forward_dynamics_fleet,
    mass_matrix_fleet,
    rnea_fleet,
)

MEMBERS = [
    (DifferentiableTwoLinkRobot, "endEffector"),
    (DifferentiableKUKAiiwa, "iiwa_link_ee"),
    (DifferentiableFrankaPanda, "panda_virtual_ee_link"),
    (DifferentiableTrifingerEdu, "finger_tip_link_120"),
    (DifferentiableFetchArm, "virtual_ee_link"),
]


@pytest.fixture(scope="module")
def fleet_setup():
    models = [ctor(dtype=jnp.float64) for ctor, _ in MEMBERS]
    structs = [m.struct for m in models]
    ees = [ee for _, ee in MEMBERS]
    fleet = build_fleet(structs, ees, dtype=jnp.float64)
    return models, structs, ees, fleet


def _padded_state(struct, max_dofs, seed):
    rng = np.random.default_rng(seed)
    D = struct.n_dofs
    out = []
    for _ in range(3):
        x = np.zeros(max_dofs)
        x[:D] = rng.uniform(-0.8, 0.8, D)
        out.append(jnp.asarray(x))
    return out


class TestFleetMatchesStatic:
    def test_all_quantities_every_member(self, fleet_setup):
        models, structs, ees, fleet = fleet_setup
        Dmax = fleet.damping.shape[-1]

        # ONE jitted program for each quantity, reused across ALL robots.
        j_rnea = jax.jit(rnea_fleet)
        j_fd = jax.jit(forward_dynamics_fleet)
        j_H = jax.jit(mass_matrix_fleet)
        j_ee = jax.jit(ee_position_fleet)
        j_jac = jax.jit(ee_jacobian_fleet)

        for r, (model, struct, ee) in enumerate(zip(models, structs, ees)):
            row = jax.tree_util.tree_map(lambda x: x[r], fleet)
            D = struct.n_dofs
            q, qd, qdd = _padded_state(struct, Dmax, seed=r)

            tau = j_rnea(row, q, qd, qdd)
            tau_ref = model.compute_inverse_dynamics(q[:D], qd[:D], qdd[:D])
            assert np.allclose(np.asarray(tau[:D]), np.asarray(tau_ref), atol=1e-9)
            assert np.allclose(np.asarray(tau[D:]), 0.0)

            qdd_f = j_fd(row, q, qd, qdd)
            qdd_ref = model.compute_forward_dynamics(q[:D], qd[:D], qdd[:D])
            assert np.allclose(np.asarray(qdd_f[:D]), np.asarray(qdd_ref), atol=1e-8)
            assert np.allclose(np.asarray(qdd_f[D:]), 0.0)

            H = j_H(row, q)
            H_ref = model.compute_lagrangian_inertia_matrix(q[:D])
            assert np.allclose(np.asarray(H[:D, :D]), np.asarray(H_ref), atol=1e-9)

            p = j_ee(row, q)
            p_ref, _ = model.compute_forward_kinematics(q[:D], ee)
            assert np.allclose(np.asarray(p), np.asarray(p_ref), atol=1e-9)

            lin, ang = j_jac(row, q)
            lin_ref, ang_ref = model.compute_endeffector_jacobian(q[:D], ee)
            assert np.allclose(np.asarray(lin[:, :D]), np.asarray(lin_ref), atol=1e-9)
            assert np.allclose(np.asarray(ang[:, :D]), np.asarray(ang_ref), atol=1e-9)

    def test_vmapped_fleet_one_program(self, fleet_setup):
        """All robots' dynamics evaluated in one vmapped call."""
        models, structs, ees, fleet = fleet_setup
        R = len(structs)
        Dmax = fleet.damping.shape[-1]
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.uniform(-0.5, 0.5, (R, Dmax)))
        qd = jnp.zeros((R, Dmax))
        qdd = jnp.zeros((R, Dmax))
        tau = jax.jit(jax.vmap(rnea_fleet))(fleet, q, qd, qdd)
        assert tau.shape == (R, Dmax)
        for r, (model, struct) in enumerate(zip(models, structs)):
            D = struct.n_dofs
            # zero-pad dofs beyond robot r's range before comparing
            tau_ref = model.compute_inverse_dynamics(
                np.asarray(q[r, :D]), np.zeros(D), np.zeros(D)
            )
            assert np.allclose(np.asarray(tau[r, :D]), np.asarray(tau_ref), atol=1e-9)

    def test_fleet_mpc_objective_differentiable(self, fleet_setup):
        """Grads flow through the fleet FK for every member at once."""
        models, structs, ees, fleet = fleet_setup
        R = len(structs)
        Dmax = fleet.damping.shape[-1]

        def cost(q_batch):
            p = jax.vmap(ee_position_fleet)(fleet, q_batch)
            return jnp.sum((p - 0.3) ** 2)

        g = jax.jit(jax.grad(cost))(jnp.zeros((R, Dmax)))
        assert np.isfinite(np.asarray(g)).all()
        # padded dof columns receive zero gradient
        for r, struct in enumerate(structs):
            assert np.allclose(np.asarray(g[r, struct.n_dofs :]), 0.0)


class TestFleetMPC:
    """SURVEY §7 configs 4/5: heterogeneous fleet reach solved in ONE
    jitted program, and identification THROUGH the fleet solve."""

    def test_fleet_reach_one_program(self, fleet_setup):
        from differentiable_robot_model_tpu.models.fleet import (
            kinematic_rollout_fleet,
            solve_fleet_kinematic_adam,
        )

        models, structs, ees, fleet = fleet_setup
        R = len(structs)
        Dmax = fleet.damping.shape[-1]
        # per-robot goal: the ee position at a feasible nonzero config
        rng = np.random.default_rng(0)
        q_goal = jnp.asarray(
            np.clip(rng.uniform(-0.6, 0.6, (R, Dmax)),
                    np.asarray(fleet.limit_lower), np.asarray(fleet.limit_upper))
        )
        goals = jax.vmap(ee_position_fleet)(fleet, q_goal)
        q0 = jnp.zeros((R, Dmax))

        res = jax.jit(
            lambda a, b: solve_fleet_kinematic_adam(
                fleet, a, b, horizon=12, n_iters=150, lr=2e-2
            )
        )(q0, goals)
        hist = np.asarray(res.cost_history)  # [R, iters]
        assert np.isfinite(hist).all()
        assert np.all(hist[:, -1] < 0.2 * hist[:, 0])
        # every member's final ee is closer to its goal than the start
        for r in range(R):
            ee_traj, _ = kinematic_rollout_fleet(
                jax.tree_util.tree_map(lambda x: x[r], fleet),
                q0[r], res.actions[r],
            )
            d_fin = np.linalg.norm(np.asarray(ee_traj[-1] - goals[r]))
            d_start = np.linalg.norm(np.asarray(ee_traj[0] - goals[r]))
            assert d_fin < 0.5 * d_start

    def test_fleet_identification_through_solve(self, fleet_setup):
        """Gradient of a through-the-solve objective w.r.t. one member's
        kinematic parameter (iiwa link translation), checked against
        central finite differences — the fleet analogue of
        test_learnable.py's identification-through-MPC test."""
        from differentiable_robot_model_tpu.models.fleet import (
            solve_fleet_kinematic_adam,
        )

        models, structs, ees, fleet = fleet_setup
        R = len(structs)
        Dmax = fleet.damping.shape[-1]
        q0 = jnp.zeros((R, Dmax))
        goals = jnp.full((R, 3), 0.35)

        def objective(delta):
            # perturb the iiwa's (member 1) link-2 translation z
            trans = fleet.trans.at[1, 2, 2].add(delta)
            fleet2 = fleet._replace(trans=trans)
            res = solve_fleet_kinematic_adam(
                fleet2, q0, goals, horizon=6, n_iters=10, lr=2e-2, eps=1e-3
            )
            return jnp.sum(res.cost)

        g = float(jax.grad(objective)(jnp.asarray(0.0)))
        eps = 1e-4
        fd = (float(objective(jnp.asarray(eps)))
              - float(objective(jnp.asarray(-eps)))) / (2 * eps)
        assert np.isfinite(g)
        assert abs(g - fd) < 5e-3 * max(1.0, abs(fd)), (g, fd)


class TestFleetDynamicMPC:
    """Torque-space (dynamics-in-the-loop) MPC on the heterogeneous fleet."""

    def test_dynamic_rollout_matches_single_robot(self, fleet_setup):
        """dynamic_rollout_fleet == the single-robot dof-major rollout for
        the iiwa member (same integrator: implicit damping, velocity clamp),
        float64."""
        from differentiable_robot_model_tpu.models.fleet import (
            dynamic_rollout_fleet,
        )
        from differentiable_robot_model_tpu.trajopt.rollout import (
            dynamic_rollout_dof_major,
        )

        models, structs, ees, fleet = fleet_setup
        struct = structs[1]  # iiwa
        D = struct.n_dofs
        Dmax = fleet.damping.shape[-1]
        row = jax.tree_util.tree_map(lambda x: x[1], fleet)
        rng = np.random.default_rng(21)
        q0 = np.zeros(Dmax)
        q0[:D] = rng.uniform(-0.5, 0.5, D)
        taus = np.zeros((6, Dmax))
        taus[:, :D] = rng.normal(0, 3.0, (6, D))
        qs_f, qds_f = dynamic_rollout_fleet(
            row, jnp.asarray(q0), jnp.zeros(Dmax), jnp.asarray(taus), dt=0.01
        )
        qs_s, qds_s = dynamic_rollout_dof_major(
            struct,
            jnp.asarray(q0[:D])[:, None],
            jnp.zeros((D, 1)),
            jnp.asarray(taus[:, :D])[:, :, None],
            dt=0.01,
        )
        assert np.allclose(np.asarray(qs_f[:, :D]), np.asarray(qs_s[..., 0]), atol=1e-9)
        assert np.allclose(np.asarray(qds_f[:, :D]), np.asarray(qds_s[..., 0]), atol=1e-9)
        # padded dofs never move
        assert np.allclose(np.asarray(qs_f[:, D:]), 0.0)

    def test_dynamic_solve_matches_single_robot(self, fleet_setup):
        """The iiwa member of the mixed-fleet TORQUE-SPACE solve equals
        `solve_dynamic_adam` on the plain iiwa struct (same algorithm,
        float64) — cost history and returned torques."""
        from differentiable_robot_model_tpu.models.fleet import (
            solve_fleet_dynamic_adam,
        )
        from differentiable_robot_model_tpu.ops import kinematics as K
        from differentiable_robot_model_tpu.trajopt.solvers import (
            solve_dynamic_adam,
        )

        models, structs, ees, fleet = fleet_setup
        R = len(structs)
        Dmax = fleet.damping.shape[-1]
        struct = structs[1]  # iiwa
        D = struct.n_dofs
        ee = struct.link_index(ees[1])

        rng = np.random.default_rng(23)
        q0 = np.zeros((R, Dmax))
        for r, s in enumerate(structs):
            q0[r, : s.n_dofs] = rng.uniform(-0.4, 0.4, s.n_dofs)
        qd0 = np.zeros((R, Dmax))
        goals = np.full((R, 3), 0.3)
        goals[1] = np.asarray(
            K.fk_world(struct, jnp.asarray(q0[1, :D]))[1][ee]
        ) + np.asarray([0.05, -0.05, 0.05])

        kw = dict(horizon=6, dt=0.02, n_iters=6, lr=0.5, eps=1e-1)
        res_f = solve_fleet_dynamic_adam(
            fleet, jnp.asarray(q0), jnp.asarray(qd0), jnp.asarray(goals), **kw
        )
        res_s = solve_dynamic_adam(
            struct,
            jnp.asarray(q0[1, :D]),
            jnp.asarray(qd0[1, :D]),
            jnp.asarray(goals[1]),
            ee,
            **kw,
        )
        assert np.allclose(
            np.asarray(res_f.cost_history[1]),
            np.asarray(res_s.cost_history),
            rtol=1e-8,
        ), (res_f.cost_history[1], res_s.cost_history)
        assert np.allclose(
            np.asarray(res_f.actions[1, :, :D]),
            np.asarray(res_s.actions),
            atol=1e-7,
        )
        assert np.allclose(np.asarray(res_f.actions[1, :, D:]), 0.0)

    def test_dynamic_fleet_solve_improves_and_respects_effort_box(
        self, fleet_setup
    ):
        """One jitted dynamic solve over all five robots: every member's
        cost decreases, padded torques stay exactly zero, and with
        respect_effort_limits=True every real torque obeys its URDF box."""
        from differentiable_robot_model_tpu.models.fleet import (
            solve_fleet_dynamic_adam,
        )

        models, structs, ees, fleet = fleet_setup
        R = len(structs)
        Dmax = fleet.damping.shape[-1]
        rng = np.random.default_rng(29)
        q0 = np.zeros((R, Dmax))
        for r, s in enumerate(structs):
            q0[r, : s.n_dofs] = rng.uniform(-0.3, 0.3, s.n_dofs)
        goals = np.full((R, 3), 0.25)

        res = jax.jit(
            lambda f, a, b, c: solve_fleet_dynamic_adam(
                f, a, b, c, horizon=8, n_iters=10, lr=0.5, eps=1e-1,
                respect_effort_limits=True,
            )
        )(fleet, jnp.asarray(q0), jnp.zeros((R, Dmax)), jnp.asarray(goals))
        hist = np.asarray(res.cost_history)
        assert np.all(np.isfinite(hist))
        assert np.all(hist[:, -1] < hist[:, 0])
        acts = np.asarray(res.actions)
        emax = np.asarray(fleet.limit_effort)
        emax = np.where(emax > 0, emax, np.inf)
        for r, s in enumerate(structs):
            Dn = s.n_dofs
            assert np.allclose(acts[r, :, Dn:], 0.0)
            assert np.all(np.abs(acts[r, :, :Dn]) <= emax[r, :Dn] + 1e-9)

    def test_specialized_kinematic_fleet_matches_padded(self, fleet_setup):
        """The kinematic fast path (solve_fleet_kinematic_specialized)
        matches the padded fleet kinematic solve per member (f64, scalar
        FK)."""
        from differentiable_robot_model_tpu.models.fleet import (
            solve_fleet_kinematic_adam,
            solve_fleet_kinematic_specialized,
        )

        models, structs, ees, fleet = fleet_setup
        R = len(structs)
        Dmax = fleet.damping.shape[-1]
        B = 2
        rng = np.random.default_rng(41)
        q0 = np.zeros((R, B, Dmax))
        for r, s in enumerate(structs):
            q0[r, :, : s.n_dofs] = rng.uniform(-0.4, 0.4, (B, s.n_dofs))
        goals = rng.uniform(0.2, 0.4, (R, B, 3))

        kw = dict(horizon=4, n_iters=5, lr=0.02, eps=1e-3)
        res_pad = solve_fleet_kinematic_adam(
            fleet, jnp.asarray(q0), jnp.asarray(goals), **kw
        )
        ee_idxs = [s.link_index(e) for s, e in zip(structs, ees)]
        res_spec = jax.jit(
            lambda qs, gs: solve_fleet_kinematic_specialized(
                structs, ee_idxs, qs, gs, fk_impl="scalar", **kw
            )
        )(
            tuple(jnp.asarray(q0[r, :, : s.n_dofs])
                  for r, s in enumerate(structs)),
            tuple(jnp.asarray(goals[r]) for r in range(R)),
        )
        for r, s in enumerate(structs):
            Dn = s.n_dofs
            assert np.allclose(
                np.asarray(res_pad.actions[r, :, :, :Dn]),
                np.asarray(res_spec[r].actions),
                atol=1e-8,
            ), r
            assert np.allclose(
                np.asarray(res_pad.cost[r]), np.asarray(res_spec[r].cost),
                rtol=1e-8,
            ), r

    def test_specialized_fleet_matches_padded_fleet(self, fleet_setup):
        """The fast path (per-member-specialized solves unrolled in one
        jitted program, models/fleet.solve_fleet_dynamic_specialized)
        produces the same torques and cost histories as the padded
        one-program-serves-any-topology fleet solve — the round-4
        fleet-vs-scan parity gate. float64, scan rollout (the kernel is
        TPU-only; kernel-vs-scan parity is tested on-chip in
        tests/test_pallas_tpu.py)."""
        from differentiable_robot_model_tpu.models.fleet import (
            solve_fleet_dynamic_adam,
            solve_fleet_dynamic_specialized,
        )

        models, structs, ees, fleet = fleet_setup
        R = len(structs)
        Dmax = fleet.damping.shape[-1]
        B = 2
        rng = np.random.default_rng(37)
        q0 = np.zeros((R, B, Dmax))
        for r, s in enumerate(structs):
            q0[r, :, : s.n_dofs] = rng.uniform(-0.3, 0.3, (B, s.n_dofs))
        goals = rng.uniform(0.2, 0.4, (R, B, 3))

        kw = dict(horizon=5, dt=0.02, n_iters=4, lr=0.5, eps=1e-1)
        res_pad = solve_fleet_dynamic_adam(
            fleet, jnp.asarray(q0), jnp.zeros((R, B, Dmax)),
            jnp.asarray(goals), **kw
        )

        ee_idxs = [s.link_index(e) for s, e in zip(structs, ees)]
        q0_t = tuple(jnp.asarray(q0[r, :, : s.n_dofs])
                     for r, s in enumerate(structs))
        qd0_t = tuple(jnp.zeros_like(x) for x in q0_t)
        goals_t = tuple(jnp.asarray(goals[r]) for r in range(R))
        res_spec = jax.jit(
            lambda qs, qds, gs: solve_fleet_dynamic_specialized(
                structs, ee_idxs, qs, qds, gs, **kw
            )
        )(q0_t, qd0_t, goals_t)

        for r, s in enumerate(structs):
            Dn = s.n_dofs
            assert np.allclose(
                np.asarray(res_pad.actions[r, :, :, :Dn]),
                np.asarray(res_spec[r].actions),
                atol=1e-7,
            ), r
            assert np.allclose(np.asarray(res_pad.actions[r, :, :, Dn:]), 0.0)
            assert np.allclose(
                np.asarray(res_pad.cost_history[r]),
                np.asarray(res_spec[r].cost_history).T,
                rtol=1e-7,
            ), r

    def test_dynamic_solve_scenario_batched_and_warm_start(self, fleet_setup):
        """The [R, B, Dmax] scenario-batched branch equals per-scenario
        solves of the [R, Dmax] form, and warm-starting from a previous
        solve's absolute torques round-trips (first-iteration cost equals
        the previous final cost)."""
        from differentiable_robot_model_tpu.models.fleet import (
            solve_fleet_dynamic_adam,
        )

        models, structs, ees, fleet = fleet_setup
        R = len(structs)
        Dmax = fleet.damping.shape[-1]
        B = 2
        rng = np.random.default_rng(31)
        q0 = np.zeros((R, B, Dmax))
        for r, s in enumerate(structs):
            q0[r, :, : s.n_dofs] = rng.uniform(-0.3, 0.3, (B, s.n_dofs))
        qd0 = np.zeros((R, B, Dmax))
        goals = rng.uniform(0.2, 0.4, (R, B, 3))

        kw = dict(horizon=5, dt=0.02, n_iters=4, lr=0.5, eps=1e-1)
        res_b = solve_fleet_dynamic_adam(
            fleet, jnp.asarray(q0), jnp.asarray(qd0), jnp.asarray(goals), **kw
        )
        assert res_b.actions.shape == (R, B, 5, Dmax)
        for b in range(B):
            res_s = solve_fleet_dynamic_adam(
                fleet,
                jnp.asarray(q0[:, b]),
                jnp.asarray(qd0[:, b]),
                jnp.asarray(goals[:, b]),
                **kw,
            )
            assert np.allclose(
                np.asarray(res_b.actions[:, b]), np.asarray(res_s.actions),
                atol=1e-9,
            ), b
            assert np.allclose(
                np.asarray(res_b.cost[:, b]), np.asarray(res_s.cost),
                rtol=1e-9,
            ), b

        # warm start: resume from the batched solve's returned torques
        res_w = solve_fleet_dynamic_adam(
            fleet, jnp.asarray(q0), jnp.asarray(qd0), jnp.asarray(goals),
            init_actions=res_b.actions, **kw,
        )
        assert np.allclose(
            np.asarray(res_w.cost_history[..., 0]), np.asarray(res_b.cost),
            rtol=1e-6,
        )
        assert np.all(
            np.asarray(res_w.cost) <= np.asarray(res_b.cost) * (1 + 1e-6)
        )
