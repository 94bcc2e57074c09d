"""Closed-loop MPC, checkpointing, profiling, tensor-util parity."""

import os

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from differentiable_robot_model_tpu import DifferentiableKUKAiiwa
from differentiable_robot_model_tpu.ops import kinematics as K
from differentiable_robot_model_tpu.trajopt.mpc import (
    MPCConfig,
    make_mpc_step,
    make_mpc_step_batch,
    mpc_init,
    run_mpc,
)
from differentiable_robot_model_tpu.utils import checkpoint as ckpt
from differentiable_robot_model_tpu.utils import tensor_utils as tu
from differentiable_robot_model_tpu.utils.profiling import benchmark


@pytest.fixture(scope="module")
def iiwa_struct():
    return DifferentiableKUKAiiwa().struct


class TestMPC:
    def test_closed_loop_reaches_goal(self, iiwa_struct):
        struct = iiwa_struct
        ee = struct.link_index("iiwa_link_ee")
        goal = K.fk_link_position(struct, jnp.zeros(7, jnp.float32), ee)
        q0 = jnp.asarray([0.6, 0.4, -0.3, -1.0, 0.5, 0.8, 0.2], jnp.float32)
        config = MPCConfig(horizon=15, iters_per_step=8, lr=0.03)
        final, metrics, q_traj = jax.jit(
            lambda: run_mpc(struct, q0, goal, ee, config, n_steps=40)
        )()
        dist = np.asarray(metrics.goal_distance)
        assert np.isfinite(dist).all()
        assert dist[-1] < 0.05
        assert dist[-1] < dist[0] * 0.2

    def test_batched_mpc_step_vmaps(self, iiwa_struct):
        struct = iiwa_struct
        ee = struct.link_index("iiwa_link_ee")
        config = MPCConfig(horizon=8, iters_per_step=3)
        step = make_mpc_step(struct, ee, config)
        B = 6
        q0 = jnp.zeros((B, 7), jnp.float32)
        goals = jnp.tile(jnp.asarray([[0.4, 0.1, 0.7]], jnp.float32), (B, 1))
        states = jax.vmap(lambda q: mpc_init(struct, q, config))(q0)
        states2, metrics = jax.jit(jax.vmap(step))(states, goals)
        assert states2.q.shape == (B, 7)
        assert np.isfinite(np.asarray(metrics.cost)).all()

    def test_batched_mpc_step_matches_vmapped(self, iiwa_struct):
        """make_mpc_step_batch (dof-major batched solver) == vmap of the
        per-sample MPC step, same algorithm same backend."""
        struct = iiwa_struct
        ee = struct.link_index("iiwa_link_ee")
        config = MPCConfig(horizon=8, iters_per_step=3, lr=0.02)
        B = 5
        rng = np.random.default_rng(4)
        q0 = jnp.asarray(rng.uniform(-0.4, 0.4, (B, 7)), jnp.float32)
        goals = jnp.asarray(rng.uniform(0.2, 0.6, (B, 3)), jnp.float32)
        states = jax.vmap(lambda q: mpc_init(struct, q, config))(q0)

        sv, mv = jax.jit(jax.vmap(make_mpc_step(struct, ee, config)))(states, goals)
        sb, mb = jax.jit(make_mpc_step_batch(struct, ee, config, fk_impl="scalar"))(
            states, goals
        )
        assert np.allclose(np.asarray(sb.q), np.asarray(sv.q), atol=1e-5)
        assert np.allclose(np.asarray(sb.plan), np.asarray(sv.plan), atol=1e-5)
        assert np.allclose(np.asarray(mb.cost), np.asarray(mv.cost), rtol=1e-5)

    def test_run_closed_loop_matches_manual_ticks(self, iiwa_struct):
        """run_closed_loop (N ticks in one device program — the
        dispatch-amortized deployment shape) equals manual tick-by-tick
        stepping for the dynamic driver, stacks per-tick metrics, and
        supports per-tick goals."""
        from differentiable_robot_model_tpu.trajopt.mpc import (
            DynamicMPCConfig,
            dynamic_mpc_init,
            make_dynamic_mpc_step,
            run_closed_loop,
        )

        struct = iiwa_struct
        ee = struct.link_index("iiwa_link_ee")
        config = DynamicMPCConfig(horizon=6, iters_per_step=2)
        step = make_dynamic_mpc_step(struct, ee, config)
        state0 = dynamic_mpc_init(
            struct, jnp.zeros(7, jnp.float32), jnp.zeros(7, jnp.float32),
            config,
        )
        goal = jnp.asarray([0.4, 0.1, 0.7], jnp.float32)
        n = 4
        final, metrics = jax.jit(
            lambda s: run_closed_loop(step, s, goal, n)
        )(state0)
        assert metrics.goal_distance.shape == (n,)

        s_manual = state0
        for _ in range(n):
            s_manual, m_manual = step(s_manual, goal)
        assert np.allclose(np.asarray(final.q), np.asarray(s_manual.q),
                           atol=1e-6)
        assert np.allclose(
            float(metrics.goal_distance[-1]), float(m_manual.goal_distance),
            atol=1e-6,
        )

        # moving setpoint: per-tick goals change the trajectory
        goals_t = jnp.stack([goal + 0.02 * i for i in range(n)])
        final2, metrics2 = jax.jit(
            lambda s: run_closed_loop(step, s, goals_t, n, per_tick_goal=True)
        )(state0)
        assert not np.allclose(np.asarray(final2.q), np.asarray(final.q))

    def test_fleet_specialized_closed_loop(self, iiwa_struct):
        """The specialized fleet MPC step (per-member solver instances in
        one trace) equals per-member make_dynamic_mpc_step_batch calls,
        supports per-member configs, and composes with run_closed_loop."""
        from differentiable_robot_model_tpu import DifferentiableTwoLinkRobot
        from differentiable_robot_model_tpu.trajopt.mpc import (
            DynamicMPCConfig,
            dynamic_mpc_init,
            make_dynamic_mpc_step_batch,
            make_fleet_dynamic_mpc_step_specialized,
            run_closed_loop,
        )

        two = DifferentiableTwoLinkRobot().struct
        structs = [two, iiwa_struct]
        ees = [two.link_index("endEffector"),
               iiwa_struct.link_index("iiwa_link_ee")]
        # per-member budgets: different horizons per member in one program
        configs = [
            DynamicMPCConfig(horizon=5, iters_per_step=2),
            DynamicMPCConfig(horizon=7, iters_per_step=3),
        ]
        B = 3
        rng = np.random.default_rng(17)
        states = tuple(
            jax.vmap(
                lambda q, s=s, c=c: dynamic_mpc_init(
                    s, q, jnp.zeros(s.n_dofs, jnp.float32), c
                )
            )(jnp.asarray(rng.uniform(-0.3, 0.3, (B, s.n_dofs)), jnp.float32))
            for s, c in zip(structs, configs)
        )
        goals = tuple(
            jnp.asarray(rng.uniform(0.2, 0.4, (B, 3)), jnp.float32)
            for _ in structs
        )

        fstep = make_fleet_dynamic_mpc_step_specialized(structs, ees, configs)
        new_states, metrics = jax.jit(fstep)(states, goals)
        for r, (s, e, c) in enumerate(zip(structs, ees, configs)):
            ref_step = make_dynamic_mpc_step_batch(s, e, c)
            ref_states, ref_metrics = ref_step(states[r], goals[r])
            assert np.allclose(
                np.asarray(new_states[r].q), np.asarray(ref_states.q),
                atol=1e-6,
            ), r
            assert np.allclose(
                np.asarray(metrics[r].cost), np.asarray(ref_metrics.cost),
                rtol=1e-6,
            ), r

        # whole-fleet closed loop: N ticks in one program
        final, hist = jax.jit(
            lambda s: run_closed_loop(fstep, s, goals, 3)
        )(states)
        assert hist[0].goal_distance.shape == (3, B)
        assert np.all(np.isfinite(np.asarray(hist[1].goal_distance)))

    def test_dynamic_mpc_closed_loop(self, iiwa_struct):
        """Closed-loop torque-space MPC: warm-started replans through the
        true forward dynamics close most of the goal distance."""
        from differentiable_robot_model_tpu.trajopt.mpc import (
            DynamicMPCConfig,
            dynamic_mpc_init,
            make_dynamic_mpc_step,
        )

        struct = iiwa_struct
        ee = struct.link_index("iiwa_link_ee")
        goal = K.fk_link_position(
            struct, jnp.asarray([0.3, 0.3, 0.0, -0.9, 0.0, 0.6, 0.0],
                                jnp.float32), ee)
        q0 = jnp.zeros(7, jnp.float32)
        config = DynamicMPCConfig(horizon=12, iters_per_step=6, lr=0.5)
        step = make_dynamic_mpc_step(struct, ee, config)

        def body(state, _):
            state, metrics = step(state, goal)
            return state, metrics.goal_distance

        state0 = dynamic_mpc_init(struct, q0, jnp.zeros(7, jnp.float32), config)
        final, dists = jax.jit(
            lambda s: jax.lax.scan(body, s, None, length=25)
        )(state0)
        d = np.asarray(dists)
        assert np.isfinite(d).all()
        assert d[-1] < 0.5 * d[0]
        assert np.all(np.isfinite(np.asarray(final.qd)))

    def test_ilqr_mpc_closed_loop(self, iiwa_struct):
        """Closed-loop second-order MPC: warm-started iLQR replans through
        the true forward dynamics close most of the goal distance (the
        drivable-iLQR path demanded by the round-2 verdict)."""
        from differentiable_robot_model_tpu.trajopt.mpc import (
            ILQRMPCConfig,
            ilqr_mpc_init,
            make_ilqr_mpc_step,
        )

        struct = iiwa_struct
        ee = struct.link_index("iiwa_link_ee")
        goal = K.fk_link_position(
            struct, jnp.asarray([0.3, 0.3, 0.0, -0.9, 0.0, 0.6, 0.0],
                                jnp.float32), ee)
        q0 = jnp.zeros(7, jnp.float32)
        config = ILQRMPCConfig(horizon=10, iters_per_step=3)
        step = make_ilqr_mpc_step(struct, ee, config)

        def body(state, _):
            state, metrics = step(state, goal)
            return state, (metrics.goal_distance, metrics.cost,
                           metrics.cost_initial)

        state0 = ilqr_mpc_init(struct, q0, jnp.zeros(7, jnp.float32), config)
        final, (dists, costs, costs0) = jax.jit(
            lambda s: jax.lax.scan(body, s, None, length=20)
        )(state0)
        d = np.asarray(dists)
        assert np.isfinite(d).all()
        assert d[-1] < 0.5 * d[0]
        # each replan's line search only ever accepts improvements
        assert np.all(np.asarray(costs) <= np.asarray(costs0) + 1e-6)
        assert np.all(np.isfinite(np.asarray(final.qd)))

    def test_ilqr_mpc_gauss_newton_vs_exact(self, iiwa_struct):
        """The analytic Gauss-Newton linearization (the driver's default —
        geometric-Jacobian cost derivatives, no jax.hessian through FK)
        reaches the same closed-loop quality as the exact-Hessian
        linearization on the reach task; both improve every replan."""
        from differentiable_robot_model_tpu.trajopt.mpc import (
            ILQRMPCConfig,
            ilqr_mpc_init,
            make_ilqr_mpc_step,
        )

        struct = iiwa_struct
        ee = struct.link_index("iiwa_link_ee")
        goal = K.fk_link_position(
            struct, jnp.asarray([0.3, 0.3, 0.0, -0.9, 0.0, 0.6, 0.0],
                                jnp.float32), ee)
        q0 = jnp.zeros(7, jnp.float32)
        finals = {}
        for lin in ("gauss_newton", "exact"):
            config = ILQRMPCConfig(
                horizon=10, iters_per_step=3, linearization=lin
            )
            step = make_ilqr_mpc_step(struct, ee, config)

            def body(state, _):
                state, metrics = step(state, goal)
                return state, (metrics.goal_distance, metrics.cost,
                               metrics.cost_initial)

            state0 = ilqr_mpc_init(struct, q0, jnp.zeros(7, jnp.float32),
                                   config)
            _, (dists, costs, costs0) = jax.jit(
                lambda s, step=step: jax.lax.scan(
                    lambda st, _: body(st, _), s, None, length=10
                )
            )(state0)
            assert np.all(np.asarray(costs) <= np.asarray(costs0) + 1e-6), lin
            finals[lin] = float(np.asarray(dists)[-1])
        d0 = float(np.linalg.norm(np.asarray(
            goal - K.fk_link_position(struct, q0[None], ee)[0]
        )))
        # both close most of the distance; GN is not worse than exact by
        # more than a small margin of the initial distance
        assert finals["gauss_newton"] < 0.5 * d0
        assert finals["exact"] < 0.5 * d0
        assert finals["gauss_newton"] <= finals["exact"] + 0.1 * d0

    def test_ilqr_mpc_respects_effort_limits(self, iiwa_struct):
        """Control-limited iLQR driver: planned torques stay inside the
        URDF effort box."""
        from differentiable_robot_model_tpu.trajopt.mpc import (
            ILQRMPCConfig,
            ilqr_mpc_init,
            make_ilqr_mpc_step,
        )

        struct = iiwa_struct
        ee = struct.link_index("iiwa_link_ee")
        goal = jnp.asarray([0.4, 0.3, 0.6], jnp.float32)
        config = ILQRMPCConfig(
            horizon=8, iters_per_step=3, respect_effort_limits=True
        )
        step = jax.jit(make_ilqr_mpc_step(struct, ee, config))
        state = ilqr_mpc_init(
            struct, jnp.zeros(7, jnp.float32), jnp.zeros(7, jnp.float32),
            config,
        )
        state, _ = step(state, goal)
        e = np.where(
            np.asarray(struct.limit_effort) > 0,
            np.asarray(struct.limit_effort), np.inf,
        )
        assert np.all(np.abs(np.asarray(state.plan)) <= e + 1e-5)

    def test_dynamic_mpc_batch_matches_vmapped(self, iiwa_struct):
        """make_dynamic_mpc_step_batch == vmap of the per-sample dynamic
        step (same algorithm, different program: the per-sample graph is
        the vmappable reference form that make_dynamic_mpc_step used to
        compile before it delegated to the dof-major batch program)."""
        from differentiable_robot_model_tpu.trajopt.mpc import (
            DynamicMPCConfig,
            _make_dynamic_mpc_step_per_sample as make_dynamic_mpc_step,
            dynamic_mpc_init,
            make_dynamic_mpc_step_batch,
        )

        struct = iiwa_struct
        ee = struct.link_index("iiwa_link_ee")
        config = DynamicMPCConfig(horizon=6, iters_per_step=3)
        B = 3
        rng = np.random.default_rng(7)
        q0 = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 7)), jnp.float32)
        qd0 = jnp.zeros((B, 7), jnp.float32)
        goals = jnp.asarray(rng.uniform(0.2, 0.5, (B, 3)), jnp.float32)
        states = jax.vmap(
            lambda q, qd: dynamic_mpc_init(struct, q, qd, config)
        )(q0, qd0)

        sv, mv = jax.jit(jax.vmap(make_dynamic_mpc_step(struct, ee, config)))(
            states, goals
        )
        sb, mb = jax.jit(make_dynamic_mpc_step_batch(struct, ee, config))(
            states, goals
        )
        assert np.allclose(np.asarray(sb.q), np.asarray(sv.q), atol=1e-4)
        assert np.allclose(np.asarray(sb.qd), np.asarray(sv.qd), atol=1e-4)
        assert np.allclose(np.asarray(sb.plan), np.asarray(sv.plan), atol=2e-3)
        assert np.allclose(np.asarray(mb.cost), np.asarray(mv.cost), rtol=1e-4)

    def test_dynamic_mpc_step_matches_per_sample_graph(self, iiwa_struct):
        """The public make_dynamic_mpc_step (which compiles the dof-major
        batch program at B=1) returns the same state/metrics, with
        unbatched shapes, as the per-sample reference graph."""
        from differentiable_robot_model_tpu.trajopt.mpc import (
            DynamicMPCConfig,
            _make_dynamic_mpc_step_per_sample,
            dynamic_mpc_init,
            make_dynamic_mpc_step,
        )

        struct = iiwa_struct
        ee = struct.link_index("iiwa_link_ee")
        config = DynamicMPCConfig(horizon=5, iters_per_step=3)
        q0 = jnp.asarray([0.2, -0.1, 0.3, -0.4, 0.1, 0.2, -0.2], jnp.float32)
        goal = jnp.asarray([0.4, 0.1, 0.7], jnp.float32)
        state0 = dynamic_mpc_init(struct, q0, jnp.zeros(7, jnp.float32), config)

        s1, m1 = jax.jit(make_dynamic_mpc_step(struct, ee, config))(state0, goal)
        s2, m2 = jax.jit(_make_dynamic_mpc_step_per_sample(struct, ee, config))(
            state0, goal
        )
        assert s1.q.shape == s2.q.shape == (7,)
        assert m1.cost.shape == m2.cost.shape == ()
        assert np.allclose(np.asarray(s1.q), np.asarray(s2.q), atol=1e-4)
        assert np.allclose(np.asarray(s1.qd), np.asarray(s2.qd), atol=1e-4)
        assert np.allclose(np.asarray(s1.plan), np.asarray(s2.plan), atol=2e-3)
        assert np.allclose(np.asarray(m1.cost), np.asarray(m2.cost), rtol=1e-4)
        assert int(s1.step_count) == int(s2.step_count) == 1

    def test_dynamic_mpc_respects_effort_limits(self, iiwa_struct):
        """respect_effort_limits=True keeps the replanned torque plan inside
        a deliberately tight actuator box through the closed-loop step."""
        from differentiable_robot_model_tpu.trajopt.mpc import (
            DynamicMPCConfig,
            dynamic_mpc_init,
            make_dynamic_mpc_step,
        )

        box = 10.0
        struct = iiwa_struct.with_arrays(
            limit_effort=jnp.full((7,), box, iiwa_struct.dtype)
        )
        ee = struct.link_index("iiwa_link_ee")
        config = DynamicMPCConfig(
            horizon=8, iters_per_step=3, respect_effort_limits=True
        )
        state = dynamic_mpc_init(
            struct, jnp.zeros(7, jnp.float32), jnp.zeros(7, jnp.float32),
            config,
        )
        goal = jnp.asarray([0.4, 0.2, 0.6], jnp.float32)
        step = jax.jit(make_dynamic_mpc_step(struct, ee, config))
        for _ in range(3):
            state, metrics = step(state, goal)
            assert np.all(np.abs(np.asarray(state.plan)) <= box + 1e-5)
        assert np.all(np.isfinite(np.asarray(state.qd)))


class TestCheckpoint:
    def test_roundtrip_params(self, tmp_path, iiwa_struct):
        tree = {
            "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
            "nested": {"b": jnp.ones(4), "c": jnp.asarray(2.5)},
        }
        path = os.path.join(tmp_path, "ckpt.npz")
        ckpt.save_pytree(path, tree)
        like = jax.tree_util.tree_map(jnp.zeros_like, tree)
        restored = ckpt.load_pytree(path, like)
        for k1, k2 in zip(
            jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(restored)
        ):
            assert np.allclose(np.asarray(k1), np.asarray(k2))

    def test_missing_key_raises(self, tmp_path):
        path = os.path.join(tmp_path, "ckpt.npz")
        ckpt.save_pytree(path, {"a": jnp.ones(2)})
        with pytest.raises(KeyError):
            ckpt.load_pytree(path, {"a": jnp.ones(2), "b": jnp.ones(2)})

    def test_model_identified_params_roundtrip(self, tmp_path):
        from differentiable_robot_model_tpu.models.parametrizations import PositiveScalar

        model = DifferentiableKUKAiiwa()
        model.make_link_param_learnable("iiwa_link_3", "mass", PositiveScalar(init_param=2.0))
        params = model.parameters()
        path = os.path.join(tmp_path, "params.npz")
        ckpt.save_pytree(path, params)
        restored = ckpt.load_pytree(path, params)
        model.set_parameters(restored)
        l = model.struct.link_index("iiwa_link_3")
        assert np.allclose(float(model.struct.mass[l]), 2.0, atol=1e-6)


class TestProfiling:
    def test_benchmark_helper(self, iiwa_struct):
        fn = jax.jit(lambda q: K.fk_world(iiwa_struct, q)[1])
        res = benchmark(fn, jnp.zeros(7, jnp.float32), iters=3, warmup=1)
        assert res.mean_s > 0 and res.best_s <= res.mean_s
        assert res.throughput(100) > 0

    def test_benchmark_windows(self, iiwa_struct):
        """windows>1 (the recorded-number methodology in bench.py and
        benchmarks/) reports best<=mean over the windows."""
        fn = jax.jit(lambda q: K.fk_world(iiwa_struct, q)[1])
        res = benchmark(fn, jnp.zeros(7, jnp.float32), iters=2, warmup=1,
                        windows=3)
        assert res.mean_s > 0 and res.best_s <= res.mean_s

    def test_benchmark_zero_warmup(self, iiwa_struct):
        """warmup=0 is bench.py's calling convention (it pre-warms by calling
        the solver itself); regression for the UnboundLocalError that crashed
        the flagship bench when no warmup iteration assigned `out`."""
        fn = jax.jit(lambda q: K.fk_world(iiwa_struct, q)[1])
        jax.block_until_ready(fn(jnp.zeros(7, jnp.float32)))
        for pipelined in (True, False):
            res = benchmark(fn, jnp.zeros(7, jnp.float32), iters=2, warmup=0,
                            windows=2, pipelined=pipelined)
            assert res.mean_s > 0 and res.best_s <= res.mean_s


class TestTensorUtils:
    def test_bfill(self):
        A = jnp.zeros((2, 3, 3))
        vec = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
        L = tu.bfill_lowertriangle(A, vec)
        assert np.allclose(np.asarray(L[0]), [[0, 0, 0], [1, 0, 0], [2, 3, 0]])
        D = tu.bfill_diagonal(A, vec)
        assert np.allclose(np.asarray(D[1]), np.diag([4, 5, 6]))

    def test_cross_and_skew(self):
        a = jnp.asarray([[1.0, 0, 0]])
        b = jnp.asarray([[0, 1.0, 0]])
        assert np.allclose(np.asarray(tu.cross_product(a, b)), [[0, 0, 1]])
        S = np.asarray(tu.vector3_to_skew_symm_matrix(a))[0]
        assert np.allclose(S, -S.T)

    def test_exp_map(self):
        w = jnp.asarray([0.0, 0.0, np.pi / 2])
        R = np.asarray(tu.exp_map_so3(w))
        assert np.allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-6)


class TestDatasets:
    def test_dataset_views(self):
        from differentiable_robot_model_tpu.utils.data import (
            ForwardDynamicsDataset,
            InverseDynamicsDataset,
        )

        n, d = 10, 7
        rng = np.random.default_rng(0)
        data = {
            k: jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
            for k in ("q", "qd", "qdd", "tau")
        }
        ds = InverseDynamicsDataset(data)
        assert len(ds) == n
        q, qd, qdd, tau = ds[3]
        assert np.allclose(np.asarray(q), np.asarray(data["q"][3]))
        assert np.allclose(np.asarray(ds.var()), np.var(np.asarray(data["tau"]), axis=0))
        fds = ForwardDynamicsDataset(data)
        assert np.allclose(np.asarray(fds.var()), np.var(np.asarray(data["qdd"]), axis=0))


class TestMPPIMPC:
    def test_closed_loop_mppi_tracks_goal(self, iiwa_struct):
        """Closed-loop MPPI: goal distance shrinks over replans, the state
        stays bounded, and the loop is deterministic in the state's key."""
        from differentiable_robot_model_tpu.ops import kinematics as K
        from differentiable_robot_model_tpu.trajopt.mpc import (
            MPPIMPCConfig,
            make_mppi_mpc_step,
            mppi_mpc_init,
        )

        struct = iiwa_struct
        ee = struct.link_index("iiwa_link_ee")
        q0 = jnp.zeros(7, jnp.float32).at[3].set(-1.2)
        goal = K.fk_link_position(struct, q0, ee) + jnp.asarray(
            [0.06, 0.06, -0.06], jnp.float32
        )
        config = MPPIMPCConfig(
            horizon=8, iters_per_step=3, n_samples=48, replan_interval=1
        )
        step = jax.jit(make_mppi_mpc_step(struct, ee, config))
        state = mppi_mpc_init(
            struct, q0, jnp.zeros(7, jnp.float32), config, jax.random.key(3)
        )
        d0 = None
        for _ in range(6):
            state, metrics = step(state, goal)
            if d0 is None:
                d0 = float(metrics.goal_distance)
        assert np.all(np.isfinite(np.asarray(state.q)))
        assert float(metrics.goal_distance) < d0
        assert int(state.step_count) == 6

        # determinism: same init key -> identical trajectory
        state_b = mppi_mpc_init(
            struct, q0, jnp.zeros(7, jnp.float32), config, jax.random.key(3)
        )
        for _ in range(2):
            state_b, _ = step(state_b, goal)
        state_a = mppi_mpc_init(
            struct, q0, jnp.zeros(7, jnp.float32), config, jax.random.key(3)
        )
        for _ in range(2):
            state_a, _ = step(state_a, goal)
        assert np.allclose(np.asarray(state_a.q), np.asarray(state_b.q))

    def test_mppi_batch_driver(self, iiwa_struct):
        """make_mppi_mpc_step_batch: batched states advance, metrics are
        finite with the right shapes, goal distance shrinks on average,
        and the loop is deterministic in the init keys (the batch solver
        derives all scenario noise from scenario 0's stream)."""
        from differentiable_robot_model_tpu.ops import kinematics as K
        from differentiable_robot_model_tpu.trajopt.mpc import (
            MPPIMPCConfig,
            make_mppi_mpc_step_batch,
            mppi_mpc_init,
        )

        struct = iiwa_struct
        ee = struct.link_index("iiwa_link_ee")
        B = 3
        q0 = jnp.tile(
            jnp.zeros(7, jnp.float32).at[3].set(-1.2)[None], (B, 1)
        )
        goals = jax.vmap(
            lambda q: K.fk_link_position(struct, q, ee)
            + jnp.asarray([0.06, 0.06, -0.06], jnp.float32)
        )(q0)
        config = MPPIMPCConfig(
            horizon=8, iters_per_step=3, n_samples=32, replan_interval=1
        )
        step = jax.jit(make_mppi_mpc_step_batch(struct, ee, config))

        def init(keys):
            return jax.vmap(
                lambda q, k: mppi_mpc_init(
                    struct, q, jnp.zeros(7, jnp.float32), config, k
                )
            )(q0, keys)

        keys = jax.random.split(jax.random.key(5), B)
        states = init(keys)
        d0 = None
        for _ in range(5):
            states, metrics = step(states, goals)
            if d0 is None:
                d0 = np.asarray(metrics.goal_distance)
        assert metrics.cost.shape == (B,)
        assert metrics.goal_distance.shape == (B,)
        assert np.all(np.isfinite(np.asarray(states.q)))
        assert np.asarray(metrics.goal_distance).mean() < d0.mean()
        assert np.all(np.asarray(states.step_count) == 5)

        states_b = init(keys)
        for _ in range(2):
            states_b, _ = step(states_b, goals)
        states_a = init(keys)
        for _ in range(2):
            states_a, _ = step(states_a, goals)
        assert np.allclose(np.asarray(states_a.q), np.asarray(states_b.q))


def test_benchmark_harnesses_parse():
    """Every benchmark harness stays syntactically valid and keeps its CLI
    surface (the TPU capture scripts must never bit-rot while the chip is
    unavailable): parse each file and check it defines main()."""
    import ast
    import os

    bench_dir = os.path.join(os.path.dirname(__file__), "..", "benchmarks")
    found = []
    for fn in sorted(os.listdir(bench_dir)):
        if not fn.endswith(".py"):
            continue
        tree = ast.parse(open(os.path.join(bench_dir, fn)).read())
        names = {n.name for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)}
        assert "main" in names, fn
        found.append(fn)
    assert {"dynamics_ops.py", "ilqr.py", "latency.py", "scaling.py",
            "dynamic_tuning.py", "mppi.py", "fleet.py"} <= set(found)
