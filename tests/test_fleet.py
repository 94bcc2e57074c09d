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
