"""COMPILED Mosaic kernel validation on the real TPU chip (opt-in).

The main suite runs the Pallas kernels in interpret mode on CPU
(tests/test_pallas.py); interpret mode checks the math but not the Mosaic
compilation. This module closes that gap: run with

    DRM_TPU_RUN_ON_TPU=1 python -m pytest tests/test_pallas_tpu.py -q

on a host with a TPU attached (the conftest skips its CPU pin in that
mode). Every test is skipped unless the default backend is tpu.

Covers (VERDICT round-1 item 4): compiled FK/RNEA kernels vs the scalar-XLA
path at several batch sizes including non-tile-multiples, VJPs vs finite
differences, and the frozen (concrete-struct) vs traced (struct-as-argument)
paths.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from differentiable_robot_model_tpu import (
    DifferentiableFrankaPanda,
    DifferentiableKUKAiiwa,
)
from differentiable_robot_model_tpu.ops.dynamics_scalar import rnea_scalar
from differentiable_robot_model_tpu.ops.kinematics import (
    fk_link_position,
    fk_link_position_dof_first,
)
from differentiable_robot_model_tpu.ops.pallas.fk import (
    fk_link_position_pallas,
    fk_position_dof_major,
)
from differentiable_robot_model_tpu.ops.pallas.rnea import rnea_pallas

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled-kernel tests need the TPU backend "
    "(run with DRM_TPU_RUN_ON_TPU=1 on a TPU host)",
)

# Batch sizes: tile-multiple (8192 = TILE_B), sub-tile, and ragged.
BATCHES = [256, 4096, 8192, 8200, 20000]


@pytest.fixture(scope="module")
def iiwa():
    return DifferentiableKUKAiiwa().struct


@pytest.fixture(scope="module")
def panda():
    return DifferentiableFrankaPanda().struct


def _rand(B, D, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-scale, scale, (B, D)), jnp.float32)


@pytest.mark.parametrize("B", BATCHES)
def test_compiled_fk_matches_scalar(iiwa, B):
    ee = iiwa.link_index("iiwa_link_ee")
    q = _rand(B, 7)
    p_k = np.asarray(jax.jit(lambda x: fk_link_position_pallas(iiwa, x, ee))(q))
    p_s = np.asarray(jax.jit(lambda x: fk_link_position(iiwa, x, ee))(q))
    assert np.allclose(p_k, p_s, atol=2e-6)


@pytest.mark.parametrize("B", BATCHES)
def test_compiled_fk_dof_major_matches_scalar(iiwa, B):
    ee = iiwa.link_index("iiwa_link_ee")
    qT = _rand(B, 7, seed=1).T
    p_k = np.asarray(jax.jit(lambda x: fk_position_dof_major(iiwa, x, ee))(qT))
    p_s = np.asarray(jax.jit(lambda x: fk_link_position_dof_first(iiwa, x, ee))(qT))
    assert np.allclose(p_k, p_s, atol=2e-6)


@pytest.mark.parametrize("B", [256, 8192, 8200])
def test_compiled_rnea_matches_scalar(iiwa, B):
    q, qd, qdd = _rand(B, 7, 2), _rand(B, 7, 3), _rand(B, 7, 4)
    t_k = np.asarray(jax.jit(lambda a, b, c: rnea_pallas(iiwa, a, b, c))(q, qd, qdd))
    t_s = np.asarray(
        jax.jit(
            lambda a, b, c: jax.vmap(lambda x, y, z: rnea_scalar(iiwa, x, y, z))(
                a, b, c
            )
        )(q, qd, qdd)
    )
    # absolute torques reach ~1e2 Nm; 1e-3 is fp32 roundoff at that scale
    assert np.allclose(t_k, t_s, atol=2e-3, rtol=1e-5)


def test_compiled_rnea_panda_branchless(panda):
    q, qd, qdd = _rand(512, 7, 5), _rand(512, 7, 6), _rand(512, 7, 7)
    t_k = np.asarray(jax.jit(lambda a, b, c: rnea_pallas(panda, a, b, c))(q, qd, qdd))
    t_s = np.asarray(
        jax.vmap(lambda x, y, z: rnea_scalar(panda, x, y, z))(q, qd, qdd)
    )
    assert np.allclose(t_k, t_s, atol=2e-3, rtol=1e-5)


def test_compiled_fk_vjp_vs_finite_differences(iiwa):
    ee = iiwa.link_index("iiwa_link_ee")
    B = 64
    q = _rand(B, 7, seed=8, scale=0.8)
    g = _rand(B, 3, seed=9)

    loss = jax.jit(
        lambda x: jnp.sum(fk_link_position_pallas(iiwa, x, ee) * g)
    )
    grad = np.asarray(jax.jit(jax.grad(loss))(q))
    eps = 1e-3
    rng = np.random.default_rng(10)
    for _ in range(5):
        d = rng.normal(size=(B, 7)).astype(np.float32)
        d /= np.linalg.norm(d)
        fd = (float(loss(q + eps * d)) - float(loss(q - eps * d))) / (2 * eps)
        an = float(np.sum(grad * d))
        assert abs(fd - an) < 5e-2 * max(1.0, abs(an))


def test_compiled_rnea_vjp_vs_finite_differences(iiwa):
    B = 64
    q, qd, qdd = _rand(B, 7, 11, 0.8), _rand(B, 7, 12, 0.5), _rand(B, 7, 13, 0.5)
    g = _rand(B, 7, seed=14)

    loss = jax.jit(lambda a: jnp.sum(rnea_pallas(iiwa, a, qd, qdd) * g))
    grad = np.asarray(jax.jit(jax.grad(loss))(q))
    eps = 1e-3
    rng = np.random.default_rng(15)
    for _ in range(3):
        d = rng.normal(size=(B, 7)).astype(np.float32)
        d /= np.linalg.norm(d)
        fd = (float(loss(q + eps * d)) - float(loss(q - eps * d))) / (2 * eps)
        an = float(np.sum(grad * d))
        assert abs(fd - an) < 5e-2 * max(1.0, abs(an))


def test_traced_struct_path_compiles_and_matches(iiwa):
    """Struct passed as a jit ARGUMENT (traced; refs path, no immediates)
    must compile on the chip and agree with the frozen path."""
    ee = iiwa.link_index("iiwa_link_ee")
    q = _rand(1024, 7, seed=16)

    frozen = jax.jit(lambda x: fk_link_position_pallas(iiwa, x, ee))(q)
    traced = jax.jit(lambda r, x: fk_link_position_pallas(r, x, ee))(iiwa, q)
    assert np.allclose(np.asarray(frozen), np.asarray(traced), atol=2e-6)

    qd, qdd = _rand(1024, 7, 17), _rand(1024, 7, 18)
    frozen_t = jax.jit(lambda a, b, c: rnea_pallas(iiwa, a, b, c))(q, qd, qdd)
    traced_t = jax.jit(lambda r, a, b, c: rnea_pallas(r, a, b, c))(iiwa, q, qd, qdd)
    assert np.allclose(np.asarray(frozen_t), np.asarray(traced_t), atol=2e-3)


def test_dynamic_mpc_solver_runs_on_chip(iiwa):
    """The dynamics-in-the-loop batched solver (the bench's second flagship)
    compiles and produces finite, improving costs on the real chip."""
    from differentiable_robot_model_tpu.trajopt.solvers import (
        solve_dynamic_adam_batch,
    )

    ee = iiwa.link_index("iiwa_link_ee")
    B = 256
    q0 = _rand(B, 7, seed=20, scale=0.5)
    qd0 = jnp.zeros((B, 7), jnp.float32)
    goals = jax.vmap(
        lambda x: fk_link_position_dof_first(iiwa, x[:, None], ee)[:, 0]
    )(_rand(B, 7, seed=21, scale=0.7))
    res = jax.jit(
        lambda a, b, c: solve_dynamic_adam_batch(
            iiwa, a, b, c, ee, horizon=20, n_iters=5, lr=2.0, eps=1e-1
        )
    )(q0, qd0, goals)
    hist = np.asarray(res.cost_history)
    assert np.all(np.isfinite(hist))
    assert np.all(hist[-1] <= hist[0])


def test_compiled_rollout_kernel_matches_scan(iiwa):
    """The fused dynamic-rollout kernel (ops/pallas/rollout.py), COMPILED:
    forward trajectories and position-cotangent gradients match the scan
    path at a ragged batch."""
    from differentiable_robot_model_tpu.ops.pallas.rollout import (
        dynamic_rollout_pallas,
    )
    from differentiable_robot_model_tpu.trajopt.rollout import (
        dynamic_rollout_dof_major,
    )

    H, B, DT = 10, 1100, 0.02  # B != tile multiple
    rng = np.random.default_rng(40)
    q0 = jnp.asarray(rng.uniform(-0.5, 0.5, (7, B)), jnp.float32)
    qd0 = jnp.asarray(rng.uniform(-0.2, 0.2, (7, B)), jnp.float32)
    tau = jnp.asarray(rng.uniform(-3, 3, (H, 7, B)), jnp.float32)

    qs_k, qds_k = jax.jit(
        lambda a, b, t: dynamic_rollout_pallas(iiwa, a, b, t, DT)
    )(q0, qd0, tau)
    qs_s, qds_s = jax.jit(
        lambda a, b, t: dynamic_rollout_dof_major(iiwa, a, b, t, DT)
    )(q0, qd0, tau)
    assert np.allclose(np.asarray(qs_k), np.asarray(qs_s), atol=5e-4)
    assert np.allclose(np.asarray(qds_k), np.asarray(qds_s), atol=2e-3)

    def loss(fn):
        return lambda t: jnp.sum(jnp.sin(fn(iiwa, q0, qd0, t, DT)[0]))

    g_k = jax.jit(jax.grad(loss(dynamic_rollout_pallas)))(tau)
    g_s = jax.jit(jax.grad(loss(dynamic_rollout_dof_major)))(tau)
    scale = max(1.0, float(jnp.max(jnp.abs(g_s))))
    assert np.allclose(
        np.asarray(g_k), np.asarray(g_s), atol=1e-3 * scale
    )


def test_compiled_ee_fused_rollout_matches_scan_fk(iiwa):
    """COMPILED EE-fused rollout (in-kernel end-effector FK): trajectory and
    ee-cotangent gradients match scan + FK."""
    from differentiable_robot_model_tpu.ops.pallas.rollout import (
        dynamic_rollout_ee_pallas,
    )
    from differentiable_robot_model_tpu.trajopt.rollout import (
        dynamic_rollout_dof_major,
    )

    ee = iiwa.link_index("iiwa_link_ee")
    H, B, DT = 10, 900, 0.02
    rng = np.random.default_rng(43)
    q0 = jnp.asarray(rng.uniform(-0.5, 0.5, (7, B)), jnp.float32)
    qd0 = jnp.asarray(rng.uniform(-0.2, 0.2, (7, B)), jnp.float32)
    tau = jnp.asarray(rng.uniform(-3, 3, (H, 7, B)), jnp.float32)

    def ref(t):
        qs, _ = dynamic_rollout_dof_major(iiwa, q0, qd0, t, DT)
        return fk_link_position_dof_first(
            iiwa, qs.transpose(1, 0, 2).reshape(7, -1), ee
        ).reshape(3, H, B).transpose(1, 0, 2)

    ps_k = jax.jit(
        lambda t: dynamic_rollout_ee_pallas(iiwa, q0, qd0, t, DT, ee)[2]
    )(tau)
    ps_r = jax.jit(ref)(tau)
    assert np.allclose(np.asarray(ps_k), np.asarray(ps_r), atol=5e-5)

    g_k = jax.jit(jax.grad(lambda t: jnp.sum(jnp.sin(
        dynamic_rollout_ee_pallas(iiwa, q0, qd0, t, DT, ee)[2]
    ))))(tau)
    g_r = jax.jit(jax.grad(lambda t: jnp.sum(jnp.sin(ref(t)))))(tau)
    scale = max(1.0, float(jnp.max(jnp.abs(g_r))))
    assert np.allclose(np.asarray(g_k), np.asarray(g_r), atol=1e-3 * scale)


def test_dynamic_mpc_pallas_rollout_on_chip(iiwa):
    """The dynamic flagship's COMPILED kernel path (bench.py's round-3
    configuration) agrees with the scan path end-to-end through a solve."""
    from differentiable_robot_model_tpu.trajopt.solvers import (
        solve_dynamic_adam_batch,
    )

    ee = iiwa.link_index("iiwa_link_ee")
    B = 64
    q0 = _rand(B, 7, seed=41, scale=0.5)
    qd0 = jnp.zeros((B, 7), jnp.float32)
    goals = jax.vmap(
        lambda x: fk_link_position_dof_first(iiwa, x[:, None], ee)[:, 0]
    )(_rand(B, 7, seed=42, scale=0.7))
    kw = dict(horizon=10, n_iters=5, lr=0.5, eps=1e-1)
    r_p = jax.jit(
        lambda a, b, c: solve_dynamic_adam_batch(
            iiwa, a, b, c, ee, rollout_impl="pallas", **kw
        ).actions
    )(q0, qd0, goals)
    r_s = jax.jit(
        lambda a, b, c: solve_dynamic_adam_batch(
            iiwa, a, b, c, ee, rollout_impl="scan", **kw
        ).actions
    )(q0, qd0, goals)
    assert np.allclose(np.asarray(r_p), np.asarray(r_s), atol=5e-3)


def test_model_api_id_impl_dispatch(iiwa):
    """compute_inverse_dynamics id_impl dispatch: auto picks Pallas above the
    measured crossover (DYNOPS_r02.json), and all three impls agree."""
    from differentiable_robot_model_tpu import DifferentiableKUKAiiwa
    from differentiable_robot_model_tpu.models.robot import _ID_PALLAS_MIN_BATCH

    model = DifferentiableKUKAiiwa()
    B = _ID_PALLAS_MIN_BATCH
    q, qd, qdd = _rand(B, 7, 30), _rand(B, 7, 31), _rand(B, 7, 32)

    t_scalar = np.asarray(model.compute_inverse_dynamics(q, qd, qdd, id_impl="scalar"))
    t_pallas = np.asarray(model.compute_inverse_dynamics(q, qd, qdd, id_impl="pallas"))
    t_auto = np.asarray(model.compute_inverse_dynamics(q, qd, qdd))
    assert np.allclose(t_pallas, t_scalar, atol=2e-3, rtol=1e-5)
    assert np.array_equal(t_auto, t_pallas)  # auto == the frozen pallas path

    # Below the crossover auto stays on the scalar path (bitwise).
    q2, qd2, qdd2 = q[:256], qd[:256], qdd[:256]
    t_small_auto = np.asarray(model.compute_inverse_dynamics(q2, qd2, qdd2))
    t_small_scalar = np.asarray(
        model.compute_inverse_dynamics(q2, qd2, qdd2, id_impl="scalar")
    )
    assert np.array_equal(t_small_auto, t_small_scalar)


def test_fused_whole_solve_kernel_on_chip(iiwa):
    """The whole-solve Adam kernel (ops/pallas/solver.py — the ENTIRE
    n_iters x (rollout + adjoint + Adam update) loop in ONE launch) matches
    the per-iteration kernel path and the scan path through a full solve,
    including the effort-box variant."""
    from differentiable_robot_model_tpu.trajopt.solvers import (
        solve_dynamic_adam_batch,
    )

    ee = iiwa.link_index("iiwa_link_ee")
    B = 64
    q0 = _rand(B, 7, seed=51, scale=0.5)
    qd0 = jnp.zeros((B, 7), jnp.float32)
    goals = jax.vmap(
        lambda x: fk_link_position_dof_first(iiwa, x[:, None], ee)[:, 0]
    )(_rand(B, 7, seed=52, scale=0.7))
    for limits in (False, True):
        kw = dict(
            horizon=10, n_iters=5, lr=0.5, eps=1e-1,
            respect_effort_limits=limits,
        )
        outs = {
            impl: np.asarray(
                jax.jit(
                    lambda a, b, c, impl=impl: solve_dynamic_adam_batch(
                        iiwa, a, b, c, ee, rollout_impl=impl, **kw
                    ).actions
                )(q0, qd0, goals)
            )
            for impl in ("fused", "pallas", "scan")
        }
        assert np.allclose(outs["fused"], outs["pallas"], atol=5e-3), limits
        assert np.allclose(outs["fused"], outs["scan"], atol=5e-3), limits


def test_kinematic_fused_whole_solve_kernel_on_chip(iiwa):
    """The kinematic whole-solve kernel (the headline workload's twin)
    matches the per-iteration FK-kernel path and the scalar path through a
    full solve, including warm starts."""
    from differentiable_robot_model_tpu.trajopt.solvers import (
        solve_kinematic_adam_batch,
    )

    ee = iiwa.link_index("iiwa_link_ee")
    B = 64
    q0 = _rand(B, 7, seed=61, scale=0.5)
    goals = jax.vmap(
        lambda x: fk_link_position_dof_first(iiwa, x[:, None], ee)[:, 0]
    )(_rand(B, 7, seed=62, scale=0.8))
    warm = 0.02 * _rand(B, 7, seed=63)[:, None, :] * jnp.ones((1, 12, 1))
    for init in (None, warm):
        kw = dict(horizon=12, n_iters=6, lr=0.05, eps=1.0, init_actions=init)
        outs = {
            impl: np.asarray(
                jax.jit(
                    lambda a, c, impl=impl: solve_kinematic_adam_batch(
                        iiwa, a, c, ee, fk_impl=impl, **kw
                    ).actions
                )(q0, goals)
            )
            for impl in ("fused", "pallas", "scalar")
        }
        tag = "warm" if init is not None else "cold"
        assert np.allclose(outs["fused"], outs["pallas"], atol=2e-3), tag
        assert np.allclose(outs["fused"], outs["scalar"], atol=2e-3), tag


def test_mppi_fused_sigma_zero_parity_on_chip(iiwa):
    """The sigma->0 parity gate the MPPI whole-solve kernel's docstring
    promises: with noise_sigma=0 every sample IS the nominal, so the fused
    solve must emit exactly the warm-start torque sequence (no update can
    occur) and its final nominal cost must match the scan path's rollout
    of the same sequence."""
    from differentiable_robot_model_tpu.trajopt.solvers import (
        solve_dynamic_mppi_batch,
    )

    ee = iiwa.link_index("iiwa_link_ee")
    B, H = 16, 10
    q0 = _rand(B, 7, seed=71, scale=0.5)
    qd0 = jnp.zeros((B, 7), jnp.float32)
    goals = jax.vmap(
        lambda x: fk_link_position_dof_first(iiwa, x[:, None], ee)[:, 0]
    )(_rand(B, 7, seed=72, scale=0.7))
    # nonzero warm start so the parity check exercises the rollout + cost,
    # not just the zero fixed point
    warm = 2.0 * _rand(B, 7, seed=73)[:, None, :] * jnp.ones((1, H, 1))
    key = jax.random.PRNGKey(3)

    outs = {}
    for impl in ("fused", "scan"):
        outs[impl] = jax.jit(
            lambda a, b, c, k, impl=impl: solve_dynamic_mppi_batch(
                iiwa, a, b, c, ee, horizon=H, key=k,
                n_iters=4, n_samples=64, noise_sigma=0.0,
                init_actions=warm, rollout_impl=impl,
            )
        )(q0, qd0, goals, key)
    a_f = np.asarray(outs["fused"].actions)
    a_s = np.asarray(outs["scan"].actions)
    # both paths must return the (clamped) warm start unchanged up to the
    # precondition round-trip (a0 = H^-1 dtau, emit H a0): fused does the
    # round-trip in-kernel with folded f32 constants, scan in XLA
    assert np.allclose(a_f, a_s, atol=2e-3), np.abs(a_f - a_s).max()
    c_f = np.asarray(outs["fused"].cost)
    c_s = np.asarray(outs["scan"].cost)
    assert np.allclose(c_f, c_s, rtol=2e-3, atol=2e-3), (c_f, c_s)


def test_mppi_fused_whole_solve_on_chip(iiwa):
    """MPPI whole-solve kernel at real sigma: per-seed determinism is
    bitwise, different seeds differ, both packed (K<=128) and unpacked
    sample layouts converge, and solution quality is comparable to the
    per-iteration pallas engine on the same problem (statistical gate:
    mean final cost within 1.5x — the PRNG streams differ by design)."""
    from differentiable_robot_model_tpu.trajopt.solvers import (
        solve_dynamic_mppi_batch,
    )

    ee = iiwa.link_index("iiwa_link_ee")
    B, H = 32, 10
    q0 = _rand(B, 7, seed=81, scale=0.5)
    qd0 = jnp.zeros((B, 7), jnp.float32)
    goals = jax.vmap(
        lambda x: fk_link_position_dof_first(iiwa, x[:, None], ee)[:, 0]
    )(_rand(B, 7, seed=82, scale=0.7))

    def run(impl, K, key):
        return jax.jit(
            lambda a, b, c, k: solve_dynamic_mppi_batch(
                iiwa, a, b, c, ee, horizon=H, key=k,
                n_iters=10, n_samples=K, rollout_impl=impl,
            )
        )(q0, qd0, goals, key)

    key = jax.random.PRNGKey(7)
    for K in (64, 256):  # packed / unpacked
        r1 = run("fused", K, key)
        hist = np.asarray(r1.cost_history)
        cost = np.asarray(r1.cost)
        assert np.all(np.isfinite(hist)) and np.all(np.isfinite(cost))
        # best sampled cost is (weakly) improving and the solve converges:
        # final nominal cost beats the initial best sample on average
        assert hist[:, -1].mean() < hist[:, 0].mean(), K

        # determinism: same key -> bitwise identical actions
        r2 = run("fused", K, key)
        assert np.array_equal(np.asarray(r1.actions), np.asarray(r2.actions))
        r3 = run("fused", K, jax.random.PRNGKey(8))
        assert not np.array_equal(
            np.asarray(r1.actions), np.asarray(r3.actions)
        )

    # quality parity vs the per-iteration engine (different PRNG streams)
    rp = run("pallas", 256, key)
    rf = run("fused", 256, key)
    mf, mp = np.asarray(rf.cost).mean(), np.asarray(rp.cost).mean()
    assert mf < 1.5 * mp, (mf, mp)


def test_fused_kernels_compose_with_shard_map(iiwa):
    """Deployment shape: the whole-solve kernels INSIDE a shard_map'd
    program. On a 1-device TPU mesh the sharded fused solves must equal
    the unsharded fused solves exactly (round-4 verdict #7 — previously
    the fused x shard_map composition was never executed anywhere)."""
    from jax.sharding import Mesh
    from differentiable_robot_model_tpu.parallel.mesh import (
        sharded_dynamic_mpc,
        sharded_kinematic_mpc,
    )
    from differentiable_robot_model_tpu.trajopt.solvers import (
        solve_dynamic_adam_batch,
        solve_kinematic_adam_batch,
    )

    mesh = Mesh(np.array(jax.devices()[:1]), ("scenario",))
    ee = iiwa.link_index("iiwa_link_ee")
    B = 64
    q0 = _rand(B, 7, seed=91, scale=0.5)
    qd0 = jnp.zeros((B, 7), jnp.float32)
    goals = jax.vmap(
        lambda x: fk_link_position_dof_first(iiwa, x[:, None], ee)[:, 0]
    )(_rand(B, 7, seed=92, scale=0.7))

    kin = sharded_kinematic_mpc(
        mesh, iiwa, ee, horizon=10, n_iters=4, lr=0.05, fk_impl="fused",
        eps=1.0,
    )
    a_sh, _ = kin(q0, goals)
    ref = solve_kinematic_adam_batch(
        iiwa, q0, goals, ee, horizon=10, n_iters=4, lr=0.05,
        fk_impl="fused", eps=1.0,
    )
    assert np.array_equal(np.asarray(a_sh), np.asarray(ref.actions))

    dyn = sharded_dynamic_mpc(
        mesh, iiwa, ee, horizon=8, n_iters=3, eps=1e-1,
        rollout_impl="fused",
    )
    da_sh, _ = dyn(q0, qd0, goals)
    dref = solve_dynamic_adam_batch(
        iiwa, q0, qd0, goals, ee, horizon=8, n_iters=3, eps=1e-1,
        rollout_impl="fused",
    )
    # not bitwise: the pre-kernel gravity-compensation RNEA and start-state
    # mass matrix are XLA-compiled and fuse differently under shard_map
    # (measured ~5e-6 relative after 3 Adam iterations); the kernel itself
    # is bitwise (the kinematic check above, which has no XLA prologue)
    da, dr = np.asarray(da_sh), np.asarray(dref.actions)
    scale = np.maximum(1.0, np.abs(dr))
    assert np.max(np.abs(da - dr) / scale) < 1e-4
