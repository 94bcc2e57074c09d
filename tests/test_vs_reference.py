"""Cross-validation against the UPSTREAM REFERENCE implementation itself.

The strongest author-independence check available on this host: the
reference library (/root/reference, PyTorch) is imported and EXECUTED as
the oracle — the same role pybullet plays in the reference's own suite
(`/root/reference/tests/test_kinematics_dynamics.py:112-131`). Every
expected value here is produced by code this repo's authors did not write.

Requires torch (CPU) and the reference checkout; skipped cleanly when
either is unavailable. The reference's one external dependency,
`urdf_parser_py`, is satisfied by the minimal test-only stub in
`tests/refstub/` (see its docstring).

Covered per robot (2link, iiwa, panda, trifinger — incl. a branched tree):
FK position+quaternion for every link, geometric end-effector Jacobian,
RNEA inverse dynamics (with and without damping/gravity), mass matrix,
ABA forward dynamics, and one gradient: d tau / d q of the summed RNEA
torque, reference autograd vs jax.grad.

Both sides run float32; tolerances sit at the float32 agreement level of
two independent formulations (the reference validates itself against
pybullet at FK 1e-6 / ID 1e-5 / mass 1e-3 rel / FD 1e-2 rel —
`/root/reference/tests/test_kinematics_dynamics.py:265-511`).
"""

import os
import sys
import zlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

REF_ROOT = "/root/reference"
_HERE = os.path.dirname(os.path.abspath(__file__))

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REF_ROOT, "differentiable_robot_model")):
    pytest.skip("reference checkout not available", allow_module_level=True)

# Make the reference (and its urdf_parser_py dependency, via the test-only
# stub) importable without installing anything.
# APPEND (not prepend): the reference checkout contains top-level package
# names that must not shadow this repo's (e.g. its stale `experiments/`
# package vs our runnable one).
for p in (os.path.join(_HERE, "refstub"), REF_ROOT):
    if p not in sys.path:
        sys.path.append(p)

ref = pytest.importorskip("differentiable_robot_model.robot_model")

import differentiable_robot_model_tpu as drm  # noqa: E402

def _ref_generic(rel_path):
    """Reference model from its own bundled URDF (robots it ships without a
    named wrapper — same pattern as its test grid,
    /root/reference/tests/test_kinematics_dynamics.py:19-52)."""
    path = os.path.join(REF_ROOT, "diff_robot_data", rel_path)
    return lambda device=None: ref.DifferentiableRobotModel(path, device=device)


ROBOTS = [
    # (name, ours ctor, reference ctor, ee link)
    ("2link", drm.DifferentiableTwoLinkRobot, ref.DifferentiableTwoLinkRobot,
     "endEffector"),
    ("iiwa", drm.DifferentiableKUKAiiwa, ref.DifferentiableKUKAiiwa,
     "iiwa_link_ee"),
    ("panda", drm.DifferentiableFrankaPanda, ref.DifferentiableFrankaPanda,
     "panda_virtual_ee_link"),
    ("trifinger", drm.DifferentiableTrifingerEdu, ref.DifferentiableTrifingerEdu,
     "finger_tip_link_0"),
    ("allegro", drm.DifferentiableAllegroHand,
     _ref_generic("allegro/urdf/allegro_hand_description_left.urdf"),
     "link_15.0_tip"),
    ("fetch_arm", drm.DifferentiableFetchArm,
     _ref_generic("fetch_description/urdf/fetch_arm_no_gripper.urdf"),
     "virtual_ee_link"),
    ("kinova", drm.DifferentiableKinovaJaco,
     _ref_generic("kinova_description/urdf/jaco_clean.urdf"),
     "j2n6s300_link_ee"),
]


@pytest.fixture(scope="module", params=ROBOTS, ids=[r[0] for r in ROBOTS])
def pair(request):
    name, ours_ctor, ref_ctor, ee = request.param
    ours = ours_ctor()
    theirs = ref_ctor(device="cpu")
    theirs._fresh_ctor = lambda: ref_ctor(device="cpu")
    D = ours.struct.n_dofs
    assert theirs._n_dofs == D, (name, theirs._n_dofs, D)
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    lo = np.asarray(ours.struct.limit_lower, np.float64)
    hi = np.asarray(ours.struct.limit_upper, np.float64)
    # continuous/unlimited joints carry non-finite or degenerate URDF
    # limits; sample those in [-pi, pi]
    degenerate = ~np.isfinite(lo) | ~np.isfinite(hi) | (hi - lo < 1e-6)
    lo = np.where(degenerate, -np.pi, lo)
    hi = np.where(degenerate, np.pi, hi)
    B = 3
    q = rng.uniform(0.6 * lo, 0.6 * hi, (B, D)).astype(np.float32)
    qd = rng.uniform(-0.6, 0.6, (B, D)).astype(np.float32)
    qdd = rng.uniform(-1.5, 1.5, (B, D)).astype(np.float32)
    return name, ours, theirs, ee, q, qd, qdd


def _t(x):
    # always copy: torch.as_tensor would share memory with the numpy input,
    # and the reference mutates arguments in place (compute_forward_dynamics
    # does `f -= damping * qd`, robot_model.py:516-521)
    return torch.tensor(np.asarray(x), dtype=torch.float32)


def _aligned_quat_err(qa, qb):
    """Max elementwise quaternion error after sign alignment (q ~ -q)."""
    sign = np.sign(np.sum(qa * qb, axis=-1, keepdims=True))
    sign = np.where(sign == 0, 1.0, sign)
    return np.abs(qa * sign - qb).max()


class TestVsReferenceImplementation:
    def test_forward_kinematics_all_links(self, pair):
        name, ours, theirs, ee, q, qd, qdd = pair
        ref_fk = theirs.compute_forward_kinematics_all_links(_t(q))
        our_fk = ours.compute_forward_kinematics_all_links(jnp.asarray(q))
        shared = [ln for ln in our_fk if ln in ref_fk]
        # every link of ours that the reference also materializes must match
        assert ee in shared and len(shared) >= ours.struct.n_dofs
        for ln in shared:
            pos_r, quat_r = (np.asarray(t.detach()) for t in ref_fk[ln])
            pos_o, quat_o = (np.asarray(t) for t in our_fk[ln])
            assert np.allclose(pos_o, pos_r, atol=2e-6), (name, ln)
            assert _aligned_quat_err(quat_o, quat_r) < 5e-6, (name, ln)

    @pytest.mark.parametrize("recursive", [False, True])
    def test_forward_kinematics_single_link(self, pair, recursive):
        """Both FK implementations on both sides (the reference's flat and
        tree-recursive paths vs our scalar-sweep and pointer-doubling
        paths) agree pairwise.

        The reference's recursive path must run on a FRESH instance: it
        composes against each body's stored `self.pose`
        (rigid_body.py:119), which any earlier flat-FK/update call has
        mutated to stale world poses — an upstream statefulness bug our
        stateless design cannot have (pinned in
        test_reference_recursive_fk_stale_state_bug below)."""
        name, ours, theirs, ee, q, qd, qdd = pair
        if recursive:
            theirs = theirs._fresh_ctor()
        pos_r, quat_r = theirs.compute_forward_kinematics(
            _t(q), ee, recursive=recursive
        )
        pos_o, quat_o = ours.compute_forward_kinematics(
            jnp.asarray(q), ee, recursive=recursive
        )
        assert np.allclose(np.asarray(pos_o), pos_r.detach().numpy(),
                           atol=2e-6)
        assert _aligned_quat_err(np.asarray(quat_o),
                                 quat_r.detach().numpy()) < 5e-6

    def test_reference_recursive_fk_stale_state_bug(self, pair):
        """Pins the upstream statefulness bug the fresh-instance workaround
        above dodges: after ANY flat FK at a different configuration, the
        reference's recursive FK returns stale-composed poses
        (rigid_body.py:119 seeds the recursion with the mutated
        `self.pose`), while our stateless recursive path is unaffected."""
        name, ours, theirs, ee, q, qd, qdd = pair
        fresh = theirs._fresh_ctor()
        clean = fresh.compute_forward_kinematics(_t(q), ee, recursive=True)[0]
        # poison the stored poses with a different configuration
        fresh.compute_forward_kinematics(_t(q + 0.3), ee, recursive=False)
        stale = fresh.compute_forward_kinematics(_t(q), ee, recursive=True)[0]
        assert not np.allclose(
            stale.detach().numpy(), clean.detach().numpy(), atol=1e-4
        ), "upstream fixed their stale-pose bug — drop the fresh-instance workaround"
        # ours: same call pattern, no state to go stale
        ours.compute_forward_kinematics(jnp.asarray(q + 0.3), ee)
        pos_o, _ = ours.compute_forward_kinematics(
            jnp.asarray(q), ee, recursive=True
        )
        assert np.allclose(
            np.asarray(pos_o), clean.detach().numpy(), atol=2e-6
        )

    def test_endeffector_jacobian(self, pair):
        name, ours, theirs, ee, q, qd, qdd = pair
        lin_r, ang_r = theirs.compute_endeffector_jacobian(_t(q), ee)
        lin_o, ang_o = ours.compute_endeffector_jacobian(jnp.asarray(q), ee)
        assert np.allclose(np.asarray(lin_o), lin_r.detach().numpy(),
                           atol=1e-5), name
        assert np.allclose(np.asarray(ang_o), ang_r.detach().numpy(),
                           atol=1e-5), name

    @pytest.mark.parametrize("gravity,damping", [(True, True), (True, False),
                                                 (False, False)])
    def test_inverse_dynamics(self, pair, gravity, damping):
        name, ours, theirs, ee, q, qd, qdd = pair
        tau_r = theirs.compute_inverse_dynamics(
            _t(q), _t(qd), _t(qdd), include_gravity=gravity,
            use_damping=damping,
        ).detach().numpy()
        tau_o = np.asarray(ours.compute_inverse_dynamics(
            jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qdd),
            include_gravity=gravity, use_damping=damping,
        ))
        scale = max(1.0, np.abs(tau_r).max())
        assert np.abs(tau_o - tau_r).max() < 2e-5 * scale, (
            name, np.abs(tau_o - tau_r).max(), scale)

    def test_non_linear_effects(self, pair):
        name, ours, theirs, ee, q, qd, qdd = pair
        nle_r = theirs.compute_non_linear_effects(_t(q), _t(qd))
        nle_o = ours.compute_non_linear_effects(jnp.asarray(q), jnp.asarray(qd))
        scale = max(1.0, np.abs(nle_r.detach().numpy()).max())
        assert np.abs(np.asarray(nle_o) - nle_r.detach().numpy()).max() \
            < 2e-5 * scale, name

    def test_mass_matrix(self, pair):
        name, ours, theirs, ee, q, qd, qdd = pair
        H_r = theirs.compute_lagrangian_inertia_matrix(_t(q)).detach().numpy()
        H_o = np.asarray(ours.compute_lagrangian_inertia_matrix(jnp.asarray(q)))
        scale = max(1.0, np.abs(H_r).max())
        assert np.abs(H_o - H_r).max() < 2e-5 * scale, name

    @pytest.mark.parametrize("method", ["crb", "aba"])
    def test_forward_dynamics(self, pair, method):
        name, ours, theirs, ee, q, qd, qdd = pair
        f = 0.3 * qdd  # modest applied torques
        qdd_r = theirs.compute_forward_dynamics(
            _t(q), _t(qd), _t(f), include_gravity=True, use_damping=True,
        ).detach().numpy()
        qdd_o = np.asarray(ours.compute_forward_dynamics(
            jnp.asarray(q), jnp.asarray(qd), jnp.asarray(f),
            include_gravity=True, use_damping=True, method=method,
        ))
        # 1e-3 relative: 10x tighter than the reference's own FD-vs-pybullet
        # gate (rtol 1e-2, test_kinematics_dynamics.py:503). kinova/allegro
        # carry near-zero virtual-link inertias, so the float32 H-solve
        # conditioning dominates at ~3e-4 relative.
        scale = max(1.0, np.abs(qdd_r).max())
        assert np.abs(qdd_o - qdd_r).max() < 1e-3 * scale, (
            name, method, np.abs(qdd_o - qdd_r).max(), scale)

    def test_forward_dynamics_old_ours_works_reference_crashes(self, pair):
        """The Euler-Lagrange FD path (`compute_forward_dynamics_old`):
        ours solves H qdd = f - nle and agrees with ABA; the reference's is
        dead on any torch >= 1.13 (robot_model.py:483 calls the removed
        `torch.solve`) — a third upstream defect only our reimplementation
        keeps usable."""
        name, ours, theirs, ee, q, qd, qdd = pair
        f = 0.3 * qdd
        qdd_old = np.asarray(ours.compute_forward_dynamics_old(
            jnp.asarray(q), jnp.asarray(qd), jnp.asarray(f),
        ))
        # note: the reference's _old defaults use_damping=True (unlike its
        # ABA path); ours mirrors that default
        qdd_aba = np.asarray(ours.compute_forward_dynamics(
            jnp.asarray(q), jnp.asarray(qd), jnp.asarray(f),
            use_damping=True, method="aba",
        ))
        scale = max(1.0, np.abs(qdd_aba).max())
        assert np.abs(qdd_old - qdd_aba).max() < 1e-3 * scale, name
        with pytest.raises(RuntimeError, match="torch.solve"):
            theirs.compute_forward_dynamics_old(_t(q), _t(qd), _t(f))

    def test_id_fd_roundtrip_cross(self, pair):
        """OUR forward dynamics inverts THEIR inverse dynamics: feed the
        reference's RNEA torques into our ABA and recover qdd."""
        name, ours, theirs, ee, q, qd, qdd = pair
        tau_r = theirs.compute_inverse_dynamics(
            _t(q), _t(qd), _t(qdd), include_gravity=True, use_damping=True,
        ).detach().numpy()
        qdd_o = np.asarray(ours.compute_forward_dynamics(
            jnp.asarray(q), jnp.asarray(qd), jnp.asarray(tau_r),
            include_gravity=True, use_damping=True, method="aba",
        ))
        # The roundtrip amplifies float32 torque error by H's inverse
        # smallest eigenvalue — on the tiny-fingertip-inertia robots
        # (allegro: ref's own self-roundtrip errs ~3e-2) that conditioning,
        # not implementation disagreement, dominates. Gate against the
        # reference's OWN self-roundtrip error on the same inputs.
        qdd_ref_rt = theirs.compute_forward_dynamics(
            _t(q), _t(qd), _t(tau_r), include_gravity=True, use_damping=True,
        ).detach().numpy()
        ref_self_err = np.abs(qdd_ref_rt - qdd).max()
        our_err = np.abs(qdd_o - qdd).max()
        scale = max(1.0, np.abs(qdd).max())
        assert our_err < max(3.0 * ref_self_err, 5e-4 * scale), (
            name, our_err, ref_self_err)

    def test_rnea_gradient_vs_reference_autograd(self, pair):
        """d/dq [sum tau]: jax.grad through our RNEA == torch.autograd
        through the reference's — gradients, not just values."""
        name, ours, theirs, ee, q, qd, qdd = pair
        qt = _t(q[:1]).requires_grad_(True)
        tau = theirs.compute_inverse_dynamics(
            qt, _t(qd[:1]), _t(qdd[:1]), include_gravity=True,
            use_damping=True,
        )
        (g_ref,) = torch.autograd.grad(tau.sum(), qt)

        def f(qq):
            return jnp.sum(ours.compute_inverse_dynamics(
                qq, jnp.asarray(qd[0]), jnp.asarray(qdd[0]),
                include_gravity=True, use_damping=True,
            ))

        g_our = np.asarray(jax.grad(f)(jnp.asarray(q[0])))
        scale = max(1.0, np.abs(g_ref.numpy()).max())
        assert np.abs(g_our - g_ref.numpy()[0]).max() < 5e-4 * scale, name
