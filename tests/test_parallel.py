"""Multi-device sharding on the 8-virtual-device CPU mesh.

The reference has no distributed tests at all (SURVEY.md §4); these validate
the scaling layer: sharded solves match unsharded results exactly, and the
data-parallel training step matches single-device training.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from differentiable_robot_model_tpu import DifferentiableKUKAiiwa
from differentiable_robot_model_tpu.parallel.mesh import (
    make_data_parallel_train_step,
    make_mesh,
    replicate,
    shard_scenarios,
    sharded_batch_solver,
)
from differentiable_robot_model_tpu.models.parametrizations import PositiveScalar
from differentiable_robot_model_tpu.trajopt.solvers import solve_kinematic_adam


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    return make_mesh(jax.devices()[:8])


@pytest.fixture(scope="module")
def iiwa():
    return DifferentiableKUKAiiwa()


def test_mesh_has_8_devices(mesh):
    assert mesh.devices.size == 8


def test_sharded_solver_matches_unsharded(mesh, iiwa):
    struct = iiwa.struct
    ee = struct.link_index("iiwa_link_ee")
    B = 16
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 7)), jnp.float32)
    goal = jnp.asarray(rng.uniform(0.2, 0.6, (B, 3)), jnp.float32)

    def solve_one(sc):
        return solve_kinematic_adam(
            struct, sc["q0"], sc["goal"], ee, horizon=5, n_iters=5
        ).actions

    sharded = sharded_batch_solver(mesh, solve_one)
    out_sharded = sharded(shard_scenarios(mesh, {"q0": q0, "goal": goal}))
    out_local = jax.jit(jax.vmap(lambda a, b: solve_one({"q0": a, "goal": b})))(
        q0, goal
    )
    assert np.allclose(np.asarray(out_sharded), np.asarray(out_local), atol=1e-6)
    # outputs actually carry the mesh sharding
    shard_devs = {d for d in out_sharded.sharding.device_set}
    assert len(shard_devs) == 8


def test_sharded_kinematic_mpc_matches_local(mesh, iiwa):
    """The shard_map'd dof-major batched solver == the local batched solver
    (scalar FK path on the CPU mesh; on TPU the same wrapper runs the Pallas
    kernels per shard)."""
    from differentiable_robot_model_tpu.parallel.mesh import sharded_kinematic_mpc
    from differentiable_robot_model_tpu.trajopt.solvers import solve_kinematic_adam_batch

    struct = iiwa.struct
    ee = struct.link_index("iiwa_link_ee")
    B, H = 16, 6
    rng = np.random.default_rng(2)
    q0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 7)), jnp.float32)
    goal = jnp.asarray(rng.uniform(0.2, 0.6, (B, 3)), jnp.float32)

    solver = sharded_kinematic_mpc(
        mesh, struct, ee, horizon=H, n_iters=5, lr=0.02, fk_impl="scalar", eps=1e-3
    )
    acts_sh, cost_sh = solver(
        *shard_scenarios(mesh, (q0, goal))
    )
    res = solve_kinematic_adam_batch(
        struct, q0, goal, ee, horizon=H, n_iters=5, lr=0.02,
        fk_impl="scalar", eps=1e-3,
    )
    assert np.allclose(np.asarray(acts_sh), np.asarray(res.actions), atol=1e-6)
    assert np.allclose(np.asarray(cost_sh), np.asarray(res.cost), rtol=1e-6)
    assert len(acts_sh.sharding.device_set) == 8


def test_data_parallel_train_step_matches_single_device(mesh, iiwa):
    iiwa_l = DifferentiableKUKAiiwa()
    iiwa_l.make_link_param_learnable("iiwa_link_3", "mass", PositiveScalar(init_param=2.0))
    params = iiwa_l.parameters()

    B = 32
    rng = np.random.default_rng(1)
    batch = {
        "q": jnp.asarray(rng.normal(size=(B, 7)), jnp.float32),
        "qd": jnp.asarray(rng.normal(size=(B, 7)), jnp.float32),
        "qdd": jnp.asarray(rng.normal(size=(B, 7)), jnp.float32),
        "tau": jnp.asarray(rng.normal(size=(B, 7)), jnp.float32),
    }

    def loss_fn(params, batch):
        pred = iiwa_l.compute_inverse_dynamics(
            batch["q"], batch["qd"], batch["qdd"], params=params
        )
        return jnp.mean((pred - batch["tau"]) ** 2)

    opt = optax.adam(1e-2)
    train = make_data_parallel_train_step(mesh, loss_fn, opt)
    p_sharded, _, loss_sharded = train(
        replicate(mesh, params), opt.init(params), shard_scenarios(mesh, batch)
    )

    # single-device baseline
    def single_step(params, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        upd, _ = opt.update(grads, opt.init(params))
        return optax.apply_updates(params, upd), loss

    p_single, loss_single = jax.jit(single_step)(params, batch)
    assert np.allclose(float(loss_sharded), float(loss_single), rtol=1e-6)
    for k in params:
        assert np.allclose(
            np.asarray(p_sharded[k]), np.asarray(p_single[k]), rtol=1e-5, atol=1e-7
        )


def test_horizon_sharded_riccati_matches_sequential(mesh):
    """The ICI-collective horizon-sharded Riccati == the single-device
    log-depth scan == the sequential recursion, on a random LQR problem
    whose horizon does NOT divide the device count (exercises identity
    padding)."""
    from differentiable_robot_model_tpu.parallel.horizon import (
        riccati_gains_horizon_sharded,
    )
    from differentiable_robot_model_tpu.trajopt.solvers import (
        _parallel_riccati_gains,
    )

    rng = np.random.default_rng(0)
    H, n, m = 21, 4, 2  # H+1 = 22 not divisible by 8
    dt = jnp.float64

    def spd(k, d):
        Q = rng.normal(size=(k, d, d))
        return jnp.asarray(Q @ np.swapaxes(Q, -1, -2) + 2 * d * np.eye(d), dt)

    A = jnp.asarray(rng.normal(size=(H, n, n)) * 0.3 + np.eye(n), dt)
    B = jnp.asarray(rng.normal(size=(H, n, m)), dt)
    lx = jnp.asarray(rng.normal(size=(H, n)), dt)
    lu = jnp.asarray(rng.normal(size=(H, m)), dt)
    lxx = spd(H, n)
    luu = spd(H, m)
    lux = jnp.asarray(rng.normal(size=(H, m, n)) * 0.1, dt)
    Vx = jnp.asarray(rng.normal(size=(n,)), dt)
    Vxx = spd(1, n)[0]

    ks_1dev, Ks_1dev = _parallel_riccati_gains(A, B, lx, lu, lxx, luu, lux, Vx, Vxx)
    ks_sh, Ks_sh = riccati_gains_horizon_sharded(
        mesh, A, B, lx, lu, lxx, luu, lux, Vx, Vxx, axis_name="scenario"
    )
    assert np.allclose(np.asarray(ks_sh), np.asarray(ks_1dev), atol=1e-9)
    assert np.allclose(np.asarray(Ks_sh), np.asarray(Ks_1dev), atol=1e-9)


def _di_problem():
    """Double-integrator iLQR problem (shared by the tests below)."""
    dt = 0.1
    goal = jnp.asarray([1.0, -0.5, 0.0, 0.0])

    def dynamics(x, u):
        pos, vel = x[:2], x[2:]
        vel2 = vel + dt * u
        return jnp.concatenate([pos + dt * vel2, vel2])

    def cost(x, u):
        return 0.1 * jnp.sum(u * u) + jnp.sum((x - goal) ** 2) + 0.05 * x[0] * u[1]

    def final_cost(x):
        return 100.0 * jnp.sum((x - goal) ** 2)

    return dynamics, cost, final_cost


def test_ilqr_horizon_sharded_matches_sequential(mesh):
    """Full iLQR with the horizon-sharded Riccati backward pass == the
    sequential recursion, iterate for iterate (VERDICT round-1 item 3:
    the ICI-collective factorization on the product path, not just a
    standalone function)."""
    from differentiable_robot_model_tpu.trajopt.solvers import ilqr

    dynamics, cost, final_cost = _di_problem()
    x0 = jnp.asarray([0.2, -0.1, 0.3, 0.05], jnp.float64)
    us0 = jnp.asarray(
        np.random.default_rng(5).normal(0, 0.1, (21, 2)), jnp.float64
    )

    r_seq = ilqr(dynamics, cost, final_cost, x0, us0, n_iters=6,
                 riccati="sequential")
    r_hs = ilqr(dynamics, cost, final_cost, x0, us0, n_iters=6,
                riccati="horizon_sharded", riccati_mesh=mesh)
    assert np.allclose(np.asarray(r_seq.us), np.asarray(r_hs.us), atol=1e-8)
    assert np.allclose(
        np.asarray(r_seq.cost_history), np.asarray(r_hs.cost_history), rtol=1e-10
    )


def test_ilqr_horizon_sharded_requires_mesh():
    from differentiable_robot_model_tpu.trajopt.solvers import ilqr

    dynamics, cost, final_cost = _di_problem()
    with pytest.raises(ValueError):
        ilqr(dynamics, cost, final_cost, jnp.zeros(4), jnp.zeros((5, 2)),
             riccati="horizon_sharded")


def test_ilqr_batch_matches_stacked_solves(mesh):
    """ilqr_batch (vmapped, mesh-sharded) == per-scenario ilqr loops."""
    from differentiable_robot_model_tpu.trajopt.solvers import ilqr, ilqr_batch

    dynamics, cost, final_cost = _di_problem()
    B, H = 8, 15
    rng = np.random.default_rng(2)
    x0s = jnp.asarray(rng.normal(0, 0.3, (B, 4)), jnp.float64)
    us0 = jnp.asarray(rng.normal(0, 0.1, (B, H, 2)), jnp.float64)

    res_sharded = ilqr_batch(
        dynamics, cost, final_cost, x0s, us0, n_iters=5,
        riccati="parallel", mesh=mesh,
    )
    res_local = ilqr_batch(
        dynamics, cost, final_cost, x0s, us0, n_iters=5, riccati="parallel"
    )
    for b in range(B):
        one = ilqr(dynamics, cost, final_cost, x0s[b], us0[b], n_iters=5,
                   riccati="parallel")
        assert np.allclose(np.asarray(res_local.us[b]), np.asarray(one.us),
                           atol=1e-9)
    assert np.allclose(np.asarray(res_sharded.us), np.asarray(res_local.us),
                       atol=1e-9)
    assert np.allclose(
        np.asarray(res_sharded.cost_history),
        np.asarray(res_local.cost_history), rtol=1e-9,
    )


def test_ilqr_batch_rejects_horizon_sharded():
    from differentiable_robot_model_tpu.trajopt.solvers import ilqr_batch

    dynamics, cost, final_cost = _di_problem()
    with pytest.raises(ValueError):
        ilqr_batch(dynamics, cost, final_cost, jnp.zeros((2, 4)),
                   jnp.zeros((2, 5, 2)), riccati="horizon_sharded")


def test_grad_through_sharded_solve(mesh, iiwa):
    """Differentiability survives sharding: grad of solve cost w.r.t. goals."""
    struct = iiwa.struct
    ee = struct.link_index("iiwa_link_ee")
    B = 8
    q0 = jnp.zeros((B, 7), jnp.float32)
    goal = jnp.full((B, 3), 0.4, jnp.float32)

    def mean_cost(goals):
        def solve_one(q0_i, g):
            return solve_kinematic_adam(struct, q0_i, g, ee, horizon=3, n_iters=2).cost

        return jnp.mean(jax.vmap(solve_one)(q0, goals))

    g = jax.jit(jax.grad(mean_cost))(shard_scenarios(mesh, goal))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_sharded_dynamic_mpc_forwards_solver_kwargs(mesh, iiwa):
    """sharded_dynamic_mpc passes extra solver kwargs through verbatim:
    with respect_effort_limits=True on a deliberately tight actuator box,
    the sharded solve equals the unsharded solve and obeys the box."""
    from differentiable_robot_model_tpu.parallel.mesh import (
        shard_scenarios,
        sharded_dynamic_mpc,
    )
    from differentiable_robot_model_tpu.trajopt.solvers import (
        solve_dynamic_adam_batch,
    )

    box = 15.0
    struct = iiwa.struct.with_arrays(
        limit_effort=jnp.full((7,), box, iiwa.struct.dtype)
    )
    ee = struct.link_index("iiwa_link_ee")
    B, H = 8, 4
    rng = np.random.default_rng(5)
    q0 = jnp.asarray(rng.uniform(-0.4, 0.4, (B, 7)), jnp.float32)
    qd0 = jnp.zeros((B, 7), jnp.float32)
    goal = jnp.asarray(rng.uniform(0.2, 0.5, (B, 3)), jnp.float32)

    kw = dict(horizon=H, n_iters=3, lr=0.5, eps=1e-1,
              respect_effort_limits=True)
    solver = sharded_dynamic_mpc(mesh, struct, ee, **kw)
    acts_sh, cost_sh = solver(*shard_scenarios(mesh, (q0, qd0, goal)))
    res = solve_dynamic_adam_batch(struct, q0, qd0, goal, ee, **kw)
    assert np.allclose(np.asarray(acts_sh), np.asarray(res.actions), atol=1e-6)
    assert np.allclose(np.asarray(cost_sh), np.asarray(res.cost), rtol=1e-6)
    assert np.all(np.abs(np.asarray(acts_sh)) <= box + 1e-5)
    assert len(acts_sh.sharding.device_set) == 8


def test_sharded_mppi_matches_unsharded(mesh, iiwa):
    """sharded_mppi with pre-split per-scenario keys equals the unsharded
    vmapped sampling solve EXACTLY (same keys => same noise => same
    weighted updates, independent of the mesh size)."""
    from differentiable_robot_model_tpu.parallel.mesh import (
        shard_scenarios,
        sharded_mppi,
    )
    from differentiable_robot_model_tpu.trajopt.solvers import (
        solve_dynamic_mppi,
    )

    struct = iiwa.struct
    ee = struct.link_index("iiwa_link_ee")
    B = 8
    rng = np.random.default_rng(11)
    q0 = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 7)), jnp.float32)
    qd0 = jnp.zeros((B, 7), jnp.float32)
    goal = jnp.asarray(rng.uniform(0.2, 0.4, (B, 3)), jnp.float32)
    keys = jax.random.split(jax.random.key(7), B)

    solver = sharded_mppi(mesh, struct, ee, horizon=4, n_samples=8, n_iters=2)
    acts_sh, cost_sh = solver(*shard_scenarios(mesh, (q0, qd0, goal, keys)))

    def one(a, b, g, k):
        r = solve_dynamic_mppi(struct, a, b, g, ee, 4, k, n_samples=8,
                               n_iters=2)
        return r.actions, r.cost

    acts_ref, cost_ref = jax.vmap(one)(q0, qd0, goal, keys)
    # same keys => same noise; the residual is reduction reassociation
    # (the softmax weighted average over the sample axis compiles
    # differently at local batch B/8 vs B) — measured ~5e-7 f32 roundoff
    assert np.allclose(np.asarray(acts_sh), np.asarray(acts_ref), atol=1e-5)
    assert np.allclose(np.asarray(cost_sh), np.asarray(cost_ref), rtol=1e-5)
    assert len(acts_sh.sharding.device_set) == 8


def test_sharded_fleet_dynamic_mpc_matches_unsharded(mesh):
    """The padded-fleet torque-space MPC with its scenario axis sharded
    over the mesh (fleet axis replicated) equals the unsharded fleet
    program."""
    from differentiable_robot_model_tpu import DifferentiableTwoLinkRobot
    from differentiable_robot_model_tpu.models.fleet import (
        build_fleet,
        solve_fleet_dynamic_adam,
    )
    from differentiable_robot_model_tpu.parallel.mesh import (
        sharded_fleet_dynamic_mpc,
    )

    structs = [
        DifferentiableTwoLinkRobot().struct,
        DifferentiableKUKAiiwa().struct,
    ]
    fleet = build_fleet(structs, ["endEffector", "iiwa_link_ee"])
    R, Dmax = 2, fleet.damping.shape[-1]
    B = 8
    rng = np.random.default_rng(13)
    q0 = np.zeros((R, B, Dmax), np.float32)
    for r, s in enumerate(structs):
        q0[r, :, : s.n_dofs] = rng.uniform(-0.3, 0.3, (B, s.n_dofs))
    q0 = jnp.asarray(q0)
    qd0 = jnp.zeros_like(q0)
    goals = jnp.asarray(rng.uniform(0.2, 0.4, (R, B, 3)), jnp.float32)

    kw = dict(n_iters=3, lr=0.5, eps=1e-1)
    solver = sharded_fleet_dynamic_mpc(mesh, fleet, horizon=4, **kw)
    acts_sh, cost_sh = solver(q0, qd0, goals)
    ref = solve_fleet_dynamic_adam(fleet, q0, qd0, goals, horizon=4, **kw)
    assert np.allclose(np.asarray(acts_sh), np.asarray(ref.actions), atol=1e-7)
    assert np.allclose(np.asarray(cost_sh), np.asarray(ref.cost), rtol=1e-6)
    assert len(acts_sh.sharding.device_set) == 8
