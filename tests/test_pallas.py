"""Pallas kernel correctness (interpreter mode on CPU; compiled on TPU).

The fused RNEA kernel must agree with the XLA scalar path (which the main
suite pins to the float64 oracle), including gradients through the custom
VJP, on chains and branched trees.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from differentiable_robot_model_tpu import (
    DifferentiableAllegroHand,
    DifferentiableFetchArm,
    DifferentiableKUKAiiwa,
)
from differentiable_robot_model_tpu.ops.dynamics_scalar import rnea_scalar
from differentiable_robot_model_tpu.ops.pallas.rnea import rnea_pallas


@pytest.mark.parametrize(
    "ctor", [DifferentiableKUKAiiwa, DifferentiableAllegroHand, DifferentiableFetchArm]
)
@pytest.mark.parametrize("use_damping", [True, False])
def test_pallas_rnea_matches_scalar(ctor, use_damping):
    model = ctor()
    s = model.struct
    B = 16
    rng = np.random.default_rng(0)
    q, qd, qdd = (
        jnp.asarray(rng.uniform(-1, 1, (B, s.n_dofs)), jnp.float32) for _ in range(3)
    )
    with pltpu.force_tpu_interpret_mode():
        tau_k = rnea_pallas(s, q, qd, qdd, True, use_damping)
    tau_ref = jax.vmap(
        lambda a, b, c: rnea_scalar(s, a, b, c, True, use_damping)
    )(q, qd, qdd)
    assert np.allclose(np.asarray(tau_k), np.asarray(tau_ref), atol=1e-4)


def test_pallas_rnea_grads():
    s = DifferentiableKUKAiiwa().struct
    B = 8
    rng = np.random.default_rng(1)
    q, qd, qdd = (
        jnp.asarray(rng.uniform(-1, 1, (B, 7)), jnp.float32) for _ in range(3)
    )

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(lambda a: jnp.sum(rnea_pallas(s, a, qd, qdd) ** 2))(q)
    g_ref = jax.grad(
        lambda a: jnp.sum(
            jax.vmap(lambda x, y, z: rnea_scalar(s, x, y, z))(a, qd, qdd) ** 2
        )
    )(q)
    assert np.allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize(
    "ctor,ee",
    [
        (DifferentiableKUKAiiwa, "iiwa_link_ee"),
        (DifferentiableAllegroHand, "link_7.0_tip"),
        (DifferentiableFetchArm, "virtual_ee_link"),
    ],
)
def test_pallas_fk_matches_scalar(ctor, ee):
    from differentiable_robot_model_tpu.ops.kinematics import fk_link_position
    from differentiable_robot_model_tpu.ops.pallas.fk import fk_link_position_pallas

    s = ctor().struct
    idx = s.link_index(ee)
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.uniform(-2.5, 2.5, (13, s.n_dofs)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        p = fk_link_position_pallas(s, q, idx)
    p_ref = fk_link_position(s, q, idx)
    assert p.shape == (13, 3)
    assert np.allclose(np.asarray(p), np.asarray(p_ref), atol=1e-5)


def test_pallas_fk_geometric_jacobian_vjp():
    """The kernel backward (geometric-Jacobian identity) == autodiff of the
    scalar path, and the dof-major packed entry agrees with the row-major one."""
    from differentiable_robot_model_tpu.ops.kinematics import fk_link_position
    from differentiable_robot_model_tpu.ops.pallas.fk import (
        fk_link_position_pallas,
        fk_position_dof_major,
    )

    s = DifferentiableKUKAiiwa().struct
    idx = s.link_index("iiwa_link_ee")
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.uniform(-2.5, 2.5, (9, 7)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(9, 3)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        dq = jax.grad(lambda a: jnp.sum(fk_link_position_pallas(s, a, idx) * g))(q)
        p_dm = fk_position_dof_major(s, q.T, idx)
        dq_dm = jax.grad(
            lambda aT: jnp.sum(fk_position_dof_major(s, aT, idx) * g.T)
        )(q.T)
    dq_ref = jax.grad(lambda a: jnp.sum(fk_link_position(s, a, idx) * g))(q)
    assert np.allclose(np.asarray(dq), np.asarray(dq_ref), atol=1e-4)
    assert np.allclose(np.asarray(p_dm.T), np.asarray(fk_link_position(s, q, idx)), atol=1e-5)
    assert np.allclose(np.asarray(dq_dm.T), np.asarray(dq_ref), atol=1e-4)


def test_pallas_fk_arbitrary_axis_and_traced_robot():
    """Non-axis-aligned joint axes (no reference URDF has them) exercise the
    generic Rodrigues path, and passing the struct through jit arguments
    (tracer) exercises the refs path — both must match the scalar XLA FK."""
    import numpy as np_
    from differentiable_robot_model_tpu.models.structs import build_struct
    from differentiable_robot_model_tpu.ops.kinematics import fk_link_position
    from differentiable_robot_model_tpu.ops.pallas.fk import fk_position_dof_major

    rng = np_.random.default_rng(9)
    L = 4
    axes = rng.normal(size=(L, 3))
    axes[0] = 0
    axes[1:] /= np_.linalg.norm(axes[1:], axis=1, keepdims=True)
    s = build_struct(
        name="synth",
        link_names=[f"l{i}" for i in range(L)],
        joint_names=[f"j{i}" for i in range(L)],
        parent=[0, 0, 1, 2],
        joint_types=[0, 1, 1, 1],
        trans=rng.normal(size=(L, 3)) * 0.2,
        rot_angles=rng.normal(size=(L, 3)) * 0.3,
        axis=axes,
        mass=np_.ones(L),
        com=np_.zeros((L, 3)),
        inertia_com=np_.tile(np_.eye(3), (L, 1, 1)),
        damping_per_link=np_.zeros(L),
        limits_per_link=np_.tile(np_.array([-3.0, 3.0, 100.0, 10.0]), (L, 1)),
        dtype=jnp.float32,
    )
    assert all(c is None for c in s.axis_code[1:])
    q = jnp.asarray(rng.uniform(-1, 1, (11, 3)), jnp.float32)
    ref = fk_link_position(s, q, 3)
    with pltpu.force_tpu_interpret_mode():
        # concrete f32 struct -> immediates path
        p_frozen = fk_position_dof_major(s, q.T, 3).T
        # concrete f64 struct -> frozen refs path (precision-preserving)
        s64 = s.astype(jnp.float64)
        p_refs = fk_position_dof_major(
            s64, q.T.astype(jnp.float64), 3
        ).T
    # struct through jit args -> tracer -> the fully differentiable scalar
    # route (traced robots never reach the kernels; see fk_position_dof_major)
    p_traced = jax.jit(lambda st, qq: fk_position_dof_major(st, qq, 3))(s, q.T).T
    assert np.allclose(np.asarray(p_frozen), np.asarray(ref), atol=1e-5)
    assert np.allclose(np.asarray(p_refs), np.asarray(ref), atol=1e-5)
    assert np.allclose(np.asarray(p_traced), np.asarray(ref), atol=1e-5)


def test_pallas_fk_robot_gradients_through_scan():
    """Round-4 regression (verdict #1): jax.grad w.r.t. ROBOT parameters
    through fk_position_dof_major inside a lax.scan must work — the old
    symbolic_zeros custom_vjp fallback raised 'Linearization failed to
    produce known values for all output primals' here. Traced robots now
    route to the scalar FK before any custom_vjp boundary; gradients are
    checked against the scalar path directly."""
    from differentiable_robot_model_tpu.ops.kinematics import (
        fk_link_position_dof_first,
    )
    from differentiable_robot_model_tpu.ops.pallas.fk import (
        fk_position_dof_major,
    )

    s = DifferentiableKUKAiiwa().struct
    idx = s.link_index("iiwa_link_ee")
    rng = np.random.default_rng(13)
    qT = jnp.asarray(rng.uniform(-1.5, 1.5, (7, 5)), jnp.float32)

    def make_loss(fk):
        def loss(trans):
            s2 = s.with_arrays(trans=trans)

            def body(carry, _):
                p = fk(s2, qT + 0.01 * carry, idx)
                return carry + 1.0, jnp.sum(p * p)

            _, ys = jax.lax.scan(body, jnp.float32(0.0), None, length=3)
            return jnp.sum(ys)

        return loss

    g_pallas_entry = jax.grad(make_loss(fk_position_dof_major))(s.trans)
    g_scalar = jax.grad(make_loss(fk_link_position_dof_first))(s.trans)
    assert np.allclose(
        np.asarray(g_pallas_entry), np.asarray(g_scalar), atol=1e-5
    )
    assert bool(jnp.all(jnp.isfinite(g_pallas_entry)))


def test_pallas_rnea_nonmultiple_batch():
    """B not a multiple of the tile size exercises the padding path."""
    s = DifferentiableKUKAiiwa().struct
    B = 37
    rng = np.random.default_rng(2)
    q, qd, qdd = (
        jnp.asarray(rng.uniform(-1, 1, (B, 7)), jnp.float32) for _ in range(3)
    )
    with pltpu.force_tpu_interpret_mode():
        tau_k = rnea_pallas(s, q, qd, qdd)
    tau_ref = jax.vmap(lambda a, b, c: rnea_scalar(s, a, b, c))(q, qd, qdd)
    assert tau_k.shape == (B, 7)
    assert np.allclose(np.asarray(tau_k), np.asarray(tau_ref), atol=1e-4)


def test_model_api_id_auto_dispatch_stays_scalar_off_tpu():
    """id_impl="auto" must never route to the Mosaic kernel off-TPU, even
    above the batch crossover; explicit "scalar" is bitwise-identical."""
    from differentiable_robot_model_tpu import DifferentiableKUKAiiwa
    from differentiable_robot_model_tpu.models.robot import _ID_PALLAS_MIN_BATCH

    model = DifferentiableKUKAiiwa()
    B = _ID_PALLAS_MIN_BATCH  # above-crossover batch, but backend is CPU
    rng = np.random.default_rng(40)
    q, qd, qdd = (
        jnp.asarray(rng.uniform(-1, 1, (B, 7)), jnp.float32) for _ in range(3)
    )
    t_auto = np.asarray(model.compute_inverse_dynamics(q, qd, qdd))
    t_scalar = np.asarray(
        model.compute_inverse_dynamics(q, qd, qdd, id_impl="scalar")
    )
    assert np.array_equal(t_auto, t_scalar)


# ---------------------------------------------------------------------------
# Fused dynamic-rollout kernel (ops/pallas/rollout.py)
# ---------------------------------------------------------------------------


class TestPallasRollout:
    H, B, DT = 5, 4, 0.02

    def _data(self, s, B=None):
        B = B or self.B
        D = s.n_dofs
        rng = np.random.default_rng(7)
        q0 = jnp.asarray(rng.uniform(-0.5, 0.5, (D, B)), jnp.float32)
        qd0 = jnp.asarray(rng.uniform(-0.2, 0.2, (D, B)), jnp.float32)
        tau = jnp.asarray(rng.uniform(-3, 3, (self.H, D, B)), jnp.float32)
        return q0, qd0, tau

    @pytest.mark.parametrize(
        "ctor",
        [DifferentiableKUKAiiwa, DifferentiableAllegroHand, DifferentiableFetchArm],
    )
    def test_rollout_matches_scan(self, ctor):
        from differentiable_robot_model_tpu.ops.pallas.rollout import (
            dynamic_rollout_pallas,
        )
        from differentiable_robot_model_tpu.trajopt.rollout import (
            dynamic_rollout_dof_major,
        )

        s = ctor().struct
        q0, qd0, tau = self._data(s)
        with pltpu.force_tpu_interpret_mode():
            qs_k, qds_k = dynamic_rollout_pallas(s, q0, qd0, tau, self.DT)
        qs_r, qds_r = dynamic_rollout_dof_major(s, q0, qd0, tau, self.DT)
        assert np.allclose(np.asarray(qs_k), np.asarray(qs_r), atol=1e-4)
        assert np.allclose(np.asarray(qds_k), np.asarray(qds_r), atol=5e-4)

    def test_rollout_backward_kernel_grads(self):
        """Position-only cotangents take the fused backward kernel; gradients
        match the scan path's VJP for all three inputs."""
        from differentiable_robot_model_tpu.ops.pallas.rollout import (
            dynamic_rollout_pallas,
        )
        from differentiable_robot_model_tpu.trajopt.rollout import (
            dynamic_rollout_dof_major,
        )

        s = DifferentiableKUKAiiwa().struct
        q0, qd0, tau = self._data(s)

        def loss(fn):
            return lambda t, a, b: jnp.sum(jnp.sin(fn(s, a, b, t, self.DT)[0]))

        with pltpu.force_tpu_interpret_mode():
            g_k = jax.grad(loss(dynamic_rollout_pallas), argnums=(0, 1, 2))(
                tau, q0, qd0
            )
        g_r = jax.grad(loss(dynamic_rollout_dof_major), argnums=(0, 1, 2))(
            tau, q0, qd0
        )
        for a, b in zip(g_k, g_r):
            scale = max(1.0, float(jnp.max(jnp.abs(b))))
            assert np.allclose(
                np.asarray(a), np.asarray(b), atol=2e-4 * scale
            )

    def test_rollout_general_cotangent_fallback(self):
        """Velocity-trajectory cotangents route to the scan-path VJP (exact)."""
        from differentiable_robot_model_tpu.ops.pallas.rollout import (
            dynamic_rollout_pallas,
        )
        from differentiable_robot_model_tpu.trajopt.rollout import (
            dynamic_rollout_dof_major,
        )

        s = DifferentiableKUKAiiwa().struct
        q0, qd0, tau = self._data(s)

        def loss(fn):
            def go(t):
                qs, qds = fn(s, q0, qd0, t, self.DT)
                return jnp.sum(jnp.sin(qs)) + jnp.sum(qds**2)

            return go

        with pltpu.force_tpu_interpret_mode():
            g_k = jax.grad(loss(dynamic_rollout_pallas))(tau)
        g_r = jax.grad(loss(dynamic_rollout_dof_major))(tau)
        scale = max(1.0, float(jnp.max(jnp.abs(g_r))))
        assert np.allclose(np.asarray(g_k), np.asarray(g_r), atol=2e-4 * scale)

    def test_solver_rollout_impl_pallas_matches_scan(self):
        """solve_dynamic_adam_batch(rollout_impl="pallas") == "scan" to
        fp32 accumulation over a short solve."""
        from differentiable_robot_model_tpu.trajopt.solvers import (
            solve_dynamic_adam_batch,
        )

        s = DifferentiableKUKAiiwa().struct
        B = 3
        rng = np.random.default_rng(11)
        q0 = jnp.asarray(rng.uniform(-0.4, 0.4, (B, 7)), jnp.float32)
        qd0 = jnp.zeros((B, 7), jnp.float32)
        goals = jnp.asarray(rng.uniform(0.2, 0.6, (B, 3)), jnp.float32)
        kw = dict(horizon=self.H, dt=self.DT, n_iters=3, eps=1e-1)
        with pltpu.force_tpu_interpret_mode():
            r_pallas = solve_dynamic_adam_batch(
                s, q0, qd0, goals, s.link_index("iiwa_link_ee"),
                rollout_impl="pallas", **kw,
            )
        r_scan = solve_dynamic_adam_batch(
            s, q0, qd0, goals, s.link_index("iiwa_link_ee"),
            rollout_impl="scan", **kw,
        )
        assert np.allclose(
            np.asarray(r_pallas.actions), np.asarray(r_scan.actions), atol=5e-3
        )
        assert np.allclose(
            np.asarray(r_pallas.cost), np.asarray(r_scan.cost), rtol=1e-3
        )

    def test_rollout_ee_matches_scan_plus_fk(self):
        """EE-fused rollout (dynamic_rollout_ee_pallas): the in-kernel
        end-effector trajectory equals scan rollout + FK, for values and
        for the ee-only-cotangent fused backward."""
        from differentiable_robot_model_tpu.ops.kinematics import (
            fk_link_position_dof_first,
        )
        from differentiable_robot_model_tpu.ops.pallas.rollout import (
            dynamic_rollout_ee_pallas,
        )
        from differentiable_robot_model_tpu.trajopt.rollout import (
            dynamic_rollout_dof_major,
        )

        s = DifferentiableKUKAiiwa().struct
        ee = s.link_index("iiwa_link_ee")
        q0, qd0, tau = self._data(s)
        D, B = q0.shape

        def ref(t):
            qs, qds = dynamic_rollout_dof_major(s, q0, qd0, t, self.DT)
            ps = fk_link_position_dof_first(
                s, qs.transpose(1, 0, 2).reshape(D, -1), ee
            ).reshape(3, self.H, B).transpose(1, 0, 2)
            return qs, qds, ps

        with pltpu.force_tpu_interpret_mode():
            qs_k, qds_k, ps_k = dynamic_rollout_ee_pallas(
                s, q0, qd0, tau, self.DT, ee
            )
        qs_r, qds_r, ps_r = ref(tau)
        assert np.allclose(np.asarray(qs_k), np.asarray(qs_r), atol=1e-4)
        assert np.allclose(np.asarray(qds_k), np.asarray(qds_r), atol=5e-4)
        assert np.allclose(np.asarray(ps_k), np.asarray(ps_r), atol=1e-4)

        # ee-only cotangent: the fused backward kernel
        def loss_k(t):
            _, _, ps = dynamic_rollout_ee_pallas(s, q0, qd0, t, self.DT, ee)
            return jnp.sum(jnp.sin(ps))

        with pltpu.force_tpu_interpret_mode():
            g_k = jax.grad(loss_k)(tau)
        g_r = jax.grad(lambda t: jnp.sum(jnp.sin(ref(t)[2])))(tau)
        scale = max(1.0, float(jnp.max(jnp.abs(g_r))))
        assert np.allclose(np.asarray(g_k), np.asarray(g_r), atol=2e-4 * scale)

        # mixed cotangents (ee + state trajectory) route to the scan VJP
        def loss_mixed(fn3):
            def go(t):
                qs, _, ps = fn3(t)
                return jnp.sum(jnp.sin(ps)) + jnp.sum(qs**2)

            return go

        with pltpu.force_tpu_interpret_mode():
            g_k2 = jax.grad(loss_mixed(
                lambda t: dynamic_rollout_ee_pallas(s, q0, qd0, t, self.DT, ee)
            ))(tau)
        g_r2 = jax.grad(loss_mixed(ref))(tau)
        scale2 = max(1.0, float(jnp.max(jnp.abs(g_r2))))
        assert np.allclose(np.asarray(g_k2), np.asarray(g_r2), atol=2e-4 * scale2)

    def test_rollout_ee_planar_robot(self):
        """Regression (round 4): a PLANAR robot folds one or more world
        coordinates of the end effector to trace-time constants, which the
        EE-fused kernel must materialize to lane tiles — the original code
        stored the scalar into an (8,128) slot (trace-time shape error)
        and fed jax.vjp a non-differentiable scalar output. Values and
        ee-cotangent gradients vs scan+FK on the 2-link."""
        from differentiable_robot_model_tpu import DifferentiableTwoLinkRobot
        from differentiable_robot_model_tpu.ops.kinematics import (
            fk_link_position_dof_first,
        )
        from differentiable_robot_model_tpu.ops.pallas.rollout import (
            dynamic_rollout_ee_pallas,
        )
        from differentiable_robot_model_tpu.trajopt.rollout import (
            dynamic_rollout_dof_major,
        )

        s = DifferentiableTwoLinkRobot().struct
        ee = s.link_index("endEffector")
        q0, qd0, tau = self._data(s)
        D, B = q0.shape

        def ref(t):
            qs, _ = dynamic_rollout_dof_major(s, q0, qd0, t, self.DT)
            return fk_link_position_dof_first(
                s, qs.transpose(1, 0, 2).reshape(D, -1), ee
            ).reshape(3, self.H, B).transpose(1, 0, 2)

        with pltpu.force_tpu_interpret_mode():
            _, _, ps_k = dynamic_rollout_ee_pallas(
                s, q0, qd0, tau, self.DT, ee
            )
        ps_r = ref(tau)
        assert np.allclose(np.asarray(ps_k), np.asarray(ps_r), atol=1e-4)
        # the planar (constant) coordinate comes out exactly constant
        const_axes = [
            j for j in range(3)
            if np.ptp(np.asarray(ps_r[:, j])) < 1e-12
        ]
        assert const_axes, "2-link should have a constant world coordinate"
        for j in const_axes:
            assert np.ptp(np.asarray(ps_k[:, j])) < 1e-12

        with pltpu.force_tpu_interpret_mode():
            g_k = jax.grad(
                lambda t: jnp.sum(
                    jnp.sin(dynamic_rollout_ee_pallas(
                        s, q0, qd0, t, self.DT, ee
                    )[2])
                )
            )(tau)
        g_r = jax.grad(lambda t: jnp.sum(jnp.sin(ref(t))))(tau)
        scale = max(1.0, float(jnp.max(jnp.abs(g_r))))
        assert np.allclose(np.asarray(g_k), np.asarray(g_r), atol=2e-4 * scale)

    def test_rollout_traced_robot_falls_back(self):
        """A traced struct (robot-parameter differentiation) transparently
        uses the scan path — robot gradients flow."""
        from differentiable_robot_model_tpu.ops.pallas.rollout import (
            dynamic_rollout_pallas,
        )

        s = DifferentiableKUKAiiwa().struct
        q0, qd0, tau = self._data(s)

        def loss(mass):
            s2 = s.with_arrays(mass=mass)
            qs, _ = dynamic_rollout_pallas(s2, q0, qd0, tau, self.DT)
            return jnp.sum(qs**2)

        g = jax.grad(loss)(s.mass)
        assert np.any(np.asarray(g) != 0)
        assert np.all(np.isfinite(np.asarray(g)))


class TestFusedSolveKernel:
    """Whole-solve Adam kernel (ops/pallas/solver.py) — CPU-checkable
    contract. Interpret-mode execution of this kernel is impractical (see
    the module docstring: the emulator's MLIR lowering blows up on the
    triply-nested loop structure), so numerical parity runs compiled on the
    chip (tests/test_pallas_tpu.py::test_fused_whole_solve_kernel_on_chip);
    here we pin the trace/shape contract and every fallback edge.
    """

    def _problem(self, dtype=jnp.float32):
        s = DifferentiableKUKAiiwa().struct
        ee = s.link_index("iiwa_link_ee")
        B, H, IT, D = 4, 6, 3, 7
        q0 = jnp.zeros((B, D), dtype)
        qd0 = jnp.zeros((B, D), dtype)
        goals = jnp.full((B, 3), 0.3, dtype)
        return s, ee, B, H, IT, q0, qd0, goals

    def test_trace_and_shapes(self):
        """The fused branch traces end-to-end and returns the same result
        structure as the other impls (actions [B,H,D], cost [B],
        history [iters, B])."""
        from differentiable_robot_model_tpu.trajopt.solvers import (
            solve_dynamic_adam_batch,
        )

        s, ee, B, H, IT, q0, qd0, goals = self._problem()
        out = jax.eval_shape(
            lambda a, b, c: solve_dynamic_adam_batch(
                s, a, b, c, ee, horizon=H, n_iters=IT, rollout_impl="fused"
            ),
            q0, qd0, goals,
        )
        assert out.actions.shape == (B, H, 7)
        assert out.cost.shape == (B,)
        assert out.cost_history.shape == (IT, B)
        assert out.actions.dtype == jnp.float32

    def test_fallback_for_f64_struct(self):
        """A non-float32 struct declines the kernel (immediates would
        downcast) and the solver transparently uses the scan/pallas path —
        same contract as the rollout kernel's fallback."""
        from differentiable_robot_model_tpu.ops.pallas.solver import (
            adam_solve_fused,
        )

        s64 = DifferentiableKUKAiiwa().struct.astype(jnp.float64)
        D = s64.n_dofs
        z = jnp.zeros((D, 2), jnp.float64)
        out = adam_solve_fused(
            s64, z, z, jnp.zeros((3, 2), jnp.float64), z, None,
            jnp.zeros((4, D, 2), jnp.float64), 0,
            n_iters=2, dt=0.02, lr=0.5, goal_weight=10.0,
            effort_weight=1e-4, eps=1e-1,
        )
        assert out is None

    def test_fallback_for_traced_struct(self):
        """A traced struct (robot-parameter differentiation) declines the
        kernel; solve_dynamic_adam_batch(rollout_impl='fused') still solves
        via the fallback and stays differentiable w.r.t. the robot."""
        from differentiable_robot_model_tpu.trajopt.solvers import (
            solve_dynamic_adam_batch,
        )

        s, ee, B, H, IT, q0, qd0, goals = self._problem()

        def loss(mass):
            s2 = s.with_arrays(mass=mass)
            res = solve_dynamic_adam_batch(
                s2, q0, qd0, goals, ee, horizon=2, n_iters=1,
                rollout_impl="fused",
            )
            return jnp.sum(res.cost)

        g = jax.grad(loss)(s.mass)
        assert g.shape == s.mass.shape
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_kinematic_trace_shapes_and_fallbacks(self):
        """Kinematic whole-solve kernel: trace/shape contract, H=1 edge
        (no action steps -> kernel declines), and f64/traced fallbacks."""
        from differentiable_robot_model_tpu.ops.pallas.solver import (
            kinematic_adam_solve_fused,
        )
        from differentiable_robot_model_tpu.trajopt.solvers import (
            solve_kinematic_adam_batch,
        )

        s, ee, B, H, IT, q0, qd0, goals = self._problem()
        out = jax.eval_shape(
            lambda a, c: solve_kinematic_adam_batch(
                s, a, c, ee, horizon=H, n_iters=IT, fk_impl="fused"
            ),
            q0, goals,
        )
        assert out.actions.shape == (B, H, 7)
        assert out.cost_history.shape == (IT, B)

        # H=1: no action steps — the kernel declines (returns None)
        D = s.n_dofs
        z32 = jnp.zeros((D, 2), jnp.float32)
        assert (
            kinematic_adam_solve_fused(
                s, z32, jnp.zeros((3, 2), jnp.float32),
                jnp.zeros((1, D, 2), jnp.float32), ee,
                n_iters=2, lr=0.05, goal_weight=100.0, eps=1.0,
            )
            is None
        )

        s64 = s.astype(jnp.float64)
        z = jnp.zeros((D, 2), jnp.float64)
        assert (
            kinematic_adam_solve_fused(
                s64, z, jnp.zeros((3, 2), jnp.float64),
                jnp.zeros((4, D, 2), jnp.float64), ee,
                n_iters=2, lr=0.05, goal_weight=100.0, eps=1.0,
            )
            is None
        )

        # traced struct: solve falls back and stays robot-differentiable
        def loss(trans):
            s2 = s.with_arrays(trans=trans)
            res = solve_kinematic_adam_batch(
                s2, q0, goals, ee, horizon=2, n_iters=1, fk_impl="fused"
            )
            return jnp.sum(res.cost)

        g = jax.grad(loss)(s.trans)
        assert g.shape == s.trans.shape
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_mppi_trace_and_shapes(self):
        """The MPPI whole-solve kernel branch traces end-to-end (packed
        K<=128 and unpacked K>128 layouts) and returns the same result
        structure as the vmapped per-iteration path."""
        from differentiable_robot_model_tpu.trajopt.solvers import (
            solve_dynamic_mppi_batch,
        )

        s, ee, B, H, IT, q0, qd0, goals = self._problem()
        key = jax.random.PRNGKey(0)
        for K in (64, 256):  # packed / unpacked sample layouts
            out = jax.eval_shape(
                lambda a, b, c, k, K=K: solve_dynamic_mppi_batch(
                    s, a, b, c, ee, horizon=H, key=k,
                    n_iters=IT, n_samples=K, rollout_impl="fused",
                ),
                q0, qd0, goals, key,
            )
            assert out.actions.shape == (B, H, 7)
            assert out.cost.shape == (B,)
            assert out.cost_history.shape == (B, IT)
            assert out.actions.dtype == jnp.float32

    def test_mppi_fused_declines(self):
        """mppi_solve_fused returns None for non-f32 structs and for
        sample counts beyond one lane tile (the caller then falls back to
        the vmapped per-iteration path)."""
        from differentiable_robot_model_tpu.ops.pallas.solver import (
            TILE_R,
            mppi_solve_fused,
        )

        s, ee, *_ = self._problem()
        D = s.n_dofs

        def call(robot, dtype, K):
            z = jnp.zeros((D, 2), dtype)
            return mppi_solve_fused(
                robot, z, z, jnp.zeros((3, 2), dtype), z, None,
                jnp.zeros((4, D, 2), dtype), jnp.zeros((2,), jnp.int32), ee,
                n_iters=2, n_samples=K, dt=0.02, temperature=0.01,
                noise_sigma=5.0, goal_weight=10.0, effort_weight=1e-4,
            )

        assert call(s.astype(jnp.float64), jnp.float64, 64) is None
        assert call(s, jnp.float32, TILE_R + 1) is None

    def test_mppi_fused_adaptation_and_traced_fall_back(self):
        """The adaptation options (adapt_sigma/adapt_temperature) and a
        traced struct are outside the kernel's contract: the batch driver
        transparently uses the per-iteration path (trace-checked — the
        result structure is unchanged)."""
        from differentiable_robot_model_tpu.trajopt.solvers import (
            solve_dynamic_mppi_batch,
        )

        s, ee, B, H, IT, q0, qd0, goals = self._problem()
        key = jax.random.PRNGKey(0)
        out = jax.eval_shape(
            lambda a, b, c, k: solve_dynamic_mppi_batch(
                s, a, b, c, ee, horizon=H, key=k, n_iters=IT,
                n_samples=32, rollout_impl="fused", adapt_sigma=True,
            ),
            q0, qd0, goals, key,
        )
        assert out.actions.shape == (B, H, 7)

        # traced struct: mppi_solve_fused declines (robot constants are not
        # trace-time foldable), the fallback still traces
        def run(trans):
            s2 = s.with_arrays(trans=trans)
            return solve_dynamic_mppi_batch(
                s2, q0, qd0, goals, ee, horizon=2, key=key, n_iters=1,
                n_samples=32, rollout_impl="fused",
            ).cost
        out2 = jax.eval_shape(run, s.trans)
        assert out2.shape == (B,)

    def test_mppi_unknown_kwarg_raises(self):
        """The fused branch rejects unknown kwargs exactly like the vmapped
        path would (round-4 advisor finding: silently-ignored typos)."""
        from differentiable_robot_model_tpu.trajopt.solvers import (
            solve_dynamic_mppi_batch,
        )

        s, ee, B, H, IT, q0, qd0, goals = self._problem()
        with pytest.raises(TypeError, match="unexpected"):
            solve_dynamic_mppi_batch(
                s, q0, qd0, goals, ee, horizon=H,
                key=jax.random.PRNGKey(0), rollout_impl="fused",
                noise_sgima=1.0,  # typo'd on purpose
            )
