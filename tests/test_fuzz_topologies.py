"""Random-topology fuzz: generated kinematic trees through the whole stack.

The oracle grid covers 10 fixed real robots; this module generates random
trees — random branching, random NON-axis-aligned joint axes (which the
reference cannot represent at all, rigid_body.py:102-107), mixed
revolute/prismatic/fixed joints, random SPD inertias, random joint origins
with nonzero rpy — emits them as URDF text, ingests them through the real
parser (`models/urdf.py`), and checks every core quantity against the
independent float64 oracle plus structural invariants. Catches
generalization bugs a fixed robot set cannot (axis normalization, deep
chains, fixed-joint interleaving, branch accumulation).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from differentiable_robot_model_tpu.models.robot import DifferentiableRobotModel

import oracle


def _random_urdf(rng: np.random.Generator) -> str:
    """A random kinematic tree as URDF text."""
    n_links = int(rng.integers(3, 9))
    lines = ['<robot name="fuzz">', '  <link name="base"/>']
    names = ["base"]
    for i in range(n_links):
        name = f"link{i}"
        parent = names[int(rng.integers(0, len(names)))]
        jtype = rng.choice(
            ["revolute", "revolute", "revolute", "prismatic", "fixed"]
        )
        xyz = rng.uniform(-0.3, 0.3, 3)
        rpy = rng.uniform(-0.8, 0.8, 3)
        axis = rng.normal(0, 1, 3)
        axis /= np.linalg.norm(axis)  # arbitrary unit axis
        mass = float(rng.uniform(0.2, 4.0))
        com = rng.uniform(-0.05, 0.05, 3)
        A = rng.normal(0, 0.08, (3, 3))
        I = A @ A.T + 0.01 * np.eye(3)  # SPD inertia
        damping = float(rng.uniform(0.0, 0.6))
        lines.append(
            f'  <link name="{name}"><inertial>'
            f'<origin xyz="{com[0]} {com[1]} {com[2]}" rpy="0 0 0"/>'
            f'<mass value="{mass}"/>'
            f'<inertia ixx="{I[0,0]}" ixy="{I[0,1]}" ixz="{I[0,2]}" '
            f'iyy="{I[1,1]}" iyz="{I[1,2]}" izz="{I[2,2]}"/>'
            f"</inertial></link>"
        )
        joint = [
            f'  <joint name="j{i}" type="{jtype}">',
            f'    <parent link="{parent}"/>',
            f'    <child link="{name}"/>',
            f'    <origin xyz="{xyz[0]} {xyz[1]} {xyz[2]}" '
            f'rpy="{rpy[0]} {rpy[1]} {rpy[2]}"/>',
        ]
        if jtype != "fixed":
            joint.append(f'    <axis xyz="{axis[0]} {axis[1]} {axis[2]}"/>')
            joint.append(
                '    <limit effort="50" lower="-2.5" upper="2.5" '
                'velocity="8"/>'
            )
            joint.append(f'    <dynamics damping="{damping}"/>')
        joint.append("  </joint>")
        lines.extend(joint)
        names.append(name)
    lines.append("</robot>")
    return "\n".join(lines)


@pytest.fixture(scope="module", params=list(range(5)), ids=lambda s: f"tree{s}")
def fuzz_robot(request, tmp_path_factory):
    rng = np.random.default_rng(1000 + request.param)
    urdf = _random_urdf(rng)
    path = tmp_path_factory.mktemp("fuzz") / f"fuzz{request.param}.urdf"
    path.write_text(urdf)
    model = DifferentiableRobotModel(str(path), dtype=jnp.float64)
    D = model.struct.n_dofs
    if D == 0:
        pytest.skip("all-fixed tree drawn")
    q = rng.uniform(-1.2, 1.2, (2, D))
    qd = rng.uniform(-0.8, 0.8, (2, D))
    qdd = rng.uniform(-1.5, 1.5, (2, D))
    return model, q, qd, qdd


class TestFuzzTrees:
    def test_fk_vs_oracle(self, fuzz_robot):
        model, q, qd, qdd = fuzz_robot
        struct = model.struct
        fk = model.compute_forward_kinematics_all_links(q)
        for b in range(q.shape[0]):
            R_o, p_o = oracle.fk(struct, q[b])
            for i, ln in enumerate(struct.link_names):
                assert np.allclose(
                    np.asarray(fk[ln][0][b]), p_o[i], atol=1e-9
                ), (ln, b)

    def test_recursive_fk_matches_default(self, fuzz_robot):
        model, q, qd, qdd = fuzz_robot
        ln = model.struct.link_names[-1]
        p0, r0 = model.compute_forward_kinematics(q, ln, recursive=False)
        p1, r1 = model.compute_forward_kinematics(q, ln, recursive=True)
        assert np.allclose(np.asarray(p0), np.asarray(p1), atol=1e-12)
        dot = np.abs(np.sum(np.asarray(r0) * np.asarray(r1), axis=-1))
        assert np.allclose(dot, 1.0, atol=1e-12)

    def test_jacobian_vs_oracle(self, fuzz_robot):
        model, q, qd, qdd = fuzz_robot
        struct = model.struct
        ln = struct.link_names[-1]
        idx = struct.link_index(ln)
        lin, ang = model.compute_endeffector_jacobian(q, ln)
        for b in range(q.shape[0]):
            l_o, a_o = oracle.jacobian(struct, q[b], idx)
            assert np.allclose(np.asarray(lin[b]), l_o, atol=1e-9), b
            assert np.allclose(np.asarray(ang[b]), a_o, atol=1e-9), b

    def test_inverse_dynamics_vs_oracle(self, fuzz_robot):
        model, q, qd, qdd = fuzz_robot
        struct = model.struct
        tau = model.compute_inverse_dynamics(q, qd, qdd)
        for b in range(q.shape[0]):
            tau_o = oracle.rnea(struct, q[b], qd[b], qdd[b])
            assert np.allclose(np.asarray(tau[b]), tau_o, atol=1e-8), b

    def test_mass_matrix_vs_oracle_and_spd(self, fuzz_robot):
        model, q, qd, qdd = fuzz_robot
        struct = model.struct
        H = np.asarray(model.compute_lagrangian_inertia_matrix(q))
        for b in range(q.shape[0]):
            H_o = oracle.mass_matrix(struct, q[b])
            assert np.allclose(H[b], H_o, atol=1e-8), b
            assert np.allclose(H[b], H[b].T, atol=1e-10)
            assert (np.linalg.eigvalsh(H[b]) > 0).all()

    @pytest.mark.parametrize("method", ["crb", "aba"])
    def test_id_fd_roundtrip(self, fuzz_robot, method):
        model, q, qd, qdd = fuzz_robot
        tau = model.compute_inverse_dynamics(q, qd, qdd, use_damping=True)
        qdd_rec = model.compute_forward_dynamics(
            q, qd, tau, use_damping=True, method=method
        )
        assert np.allclose(np.asarray(qdd_rec), qdd, atol=1e-6), method

    def test_gradients_finite(self, fuzz_robot):
        """d(sum tau)/dq is finite and matches float64 central differences
        on a random tree (catches differentiation breakages off the fixed
        robot set)."""
        model, q, qd, qdd = fuzz_robot
        struct = model.struct

        def f(qq):
            return jnp.sum(
                model.compute_inverse_dynamics(qq, qd[0], qdd[0])
            )

        g = np.asarray(jax.grad(f)(jnp.asarray(q[0])))
        assert np.all(np.isfinite(g))
        eps = 1e-6
        for j in range(min(3, struct.n_dofs)):
            e = np.zeros_like(q[0])
            e[j] = eps
            fd = (float(f(jnp.asarray(q[0] + e))) -
                  float(f(jnp.asarray(q[0] - e)))) / (2 * eps)
            assert np.isclose(fd, g[j], rtol=1e-5, atol=1e-7), (j, fd, g[j])


def test_fleet_of_random_trees_matches_single(tmp_path):
    """The padded heterogeneous-fleet path generalizes to random trees:
    a 3-member fleet of generated robots (different link/dof counts,
    arbitrary axes) matches each member's single-robot FK/ID in float64."""
    from differentiable_robot_model_tpu.models.fleet import (
        build_fleet,
        ee_position_fleet,
        rnea_fleet,
    )
    from differentiable_robot_model_tpu.ops import kinematics as K

    models = []
    rng_master = np.random.default_rng(77)
    i = 0
    while len(models) < 3:
        rng = np.random.default_rng(2000 + i)
        i += 1
        path = tmp_path / f"f{i}.urdf"
        path.write_text(_random_urdf(rng))
        m = DifferentiableRobotModel(str(path), dtype=jnp.float64)
        if m.struct.n_dofs >= 2:
            models.append(m)
    structs = [m.struct for m in models]
    ees = [s.link_names[-1] for s in structs]
    fleet = build_fleet(structs, ees, dtype=jnp.float64)
    Dmax = fleet.damping.shape[-1]

    q = np.zeros((3, Dmax))
    qd = np.zeros((3, Dmax))
    qdd = np.zeros((3, Dmax))
    for r, s in enumerate(structs):
        D = s.n_dofs
        q[r, :D] = rng_master.uniform(-1.0, 1.0, D)
        qd[r, :D] = rng_master.uniform(-0.5, 0.5, D)
        qdd[r, :D] = rng_master.uniform(-1.0, 1.0, D)

    p_f = jax.vmap(ee_position_fleet)(fleet, jnp.asarray(q))
    tau_f = jax.vmap(rnea_fleet)(
        fleet, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qdd)
    )
    for r, s in enumerate(structs):
        D = s.n_dofs
        ee = s.link_index(ees[r])
        p_s = K.fk_world(s, jnp.asarray(q[r, :D]))[1][ee]
        assert np.allclose(np.asarray(p_f[r]), np.asarray(p_s), atol=1e-9), r
        tau_s = oracle.rnea(s, q[r, :D], qd[r, :D], qdd[r, :D])
        assert np.allclose(np.asarray(tau_f[r, :D]), tau_s, atol=1e-8), r
        assert np.allclose(np.asarray(tau_f[r, D:]), 0.0), r


def test_dynamic_rollout_bounded_on_random_trees(tmp_path):
    """The velocity-clamped semi-implicit rollout stays finite on random
    trees under aggressive random torques (the boundedness property the
    dynamic solvers rely on, trajopt/rollout.py:_velocity_bound) — and the
    velocity bound actually binds."""
    from differentiable_robot_model_tpu.trajopt.rollout import (
        dynamic_rollout_dof_major,
    )

    hit_any = False
    for seed in (3000, 3001, 3002):
        rng = np.random.default_rng(seed)
        path = tmp_path / f"s{seed}.urdf"
        path.write_text(_random_urdf(rng))
        model = DifferentiableRobotModel(str(path), dtype=jnp.float64)
        struct = model.struct
        D = struct.n_dofs
        if D == 0:
            continue
        B = 4
        q0T = jnp.asarray(rng.uniform(-0.5, 0.5, (D, B)))
        qd0T = jnp.zeros((D, B))
        taus = jnp.asarray(rng.normal(0, 40.0, (60, D, B)))  # violent
        qs, qds = dynamic_rollout_dof_major(struct, q0T, qd0T, taus, dt=0.02)
        assert np.all(np.isfinite(np.asarray(qs))), seed
        assert np.all(np.isfinite(np.asarray(qds))), seed
        vmax = np.asarray(struct.limit_velocity)
        vmax = np.where(vmax > 0, vmax, np.inf)[:, None]
        assert np.all(np.abs(np.asarray(qds)) <= vmax + 1e-9), seed
        hit_any |= bool(np.any(np.abs(np.asarray(qds)) > 0.999 * vmax))
    assert hit_any  # the clamp genuinely engaged somewhere
