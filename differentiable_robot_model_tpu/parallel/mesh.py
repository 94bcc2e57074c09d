"""Device-mesh scaling: sharded MPC solves and data-parallel training.

The reference is strictly single-process/single-device (SURVEY.md §2: no
torch.distributed, no parallelism beyond a leading batch dim). This module is
the TPU-native scaling layer it lacks, built the JAX way: pick a Mesh,
annotate shardings, let XLA insert collectives.

Sharding layout:
- `scenario` axis: embarrassingly-parallel MPC scenario batches and training
  minibatches shard over all chips (DCN-friendly across hosts; within a host
  the axis rides ICI). Solves need no cross-chip communication at all.
- Training gradients: expressed with `shard_map` + `psum` over the scenario
  axis — the all-reduce maps onto ICI rings within a slice.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SCENARIO_AXIS = "scenario"


def make_mesh(devices=None, axis_name: str = SCENARIO_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices for scenario/data parallelism."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def shard_scenarios(mesh: Mesh, tree, axis_name: str = SCENARIO_AXIS):
    """Place each array's leading axis across the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def sharded_batch_solver(
    mesh: Mesh, solve_one: Callable, axis_name: str = SCENARIO_AXIS
):
    """Compile `solve_one(scenario_pytree) -> result` into a mesh-sharded
    batched solver.

    The returned function takes scenario arrays with a leading batch axis
    sharded over the mesh and runs vmap(solve_one) with inputs/outputs pinned
    to the scenario sharding — XLA partitions the whole solve with zero
    communication (each chip owns B/n_devices scenarios).
    """
    batched = jax.vmap(solve_one)
    in_shard = NamedSharding(mesh, P(axis_name))

    def run(scenarios):
        scenarios = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, in_shard), scenarios
        )
        return batched(scenarios)

    return jax.jit(run)


def sharded_kinematic_mpc(
    mesh: Mesh,
    robot,
    ee_link_idx: int,
    horizon: int,
    n_iters: int = 10,
    lr: float = 1e-3,
    goal_weight: float = 100.0,
    fk_impl: str = "pallas",
    eps: float = 1e-8,
    axis_name: str = SCENARIO_AXIS,
    **solver_kwargs,
):
    """Mesh-sharded wrapper of the dof-major batched MPC solver.

    Returns `solve(q0 [B, D], goals [B, 3]) -> (actions [B, H, D], cost [B])`
    with the scenario axis sharded over the mesh via `shard_map`: each device
    runs the full fused solve (Pallas FK kernels included) on its local
    B/n_devices scenarios — zero collectives, so scaling is linear in chips
    and rides DCN across hosts for free. This is the multi-chip form of the
    headline benchmark (bench.py; >10k solves/s target on a 16-chip slice).
    """
    from jax import shard_map

    from ..trajopt.solvers import solve_kinematic_adam_batch

    def local_solve(q0, goals):
        res = solve_kinematic_adam_batch(
            robot, q0, goals, ee_link_idx,
            horizon=horizon, n_iters=n_iters, lr=lr,
            goal_weight=goal_weight, fk_impl=fk_impl, eps=eps,
            **solver_kwargs,
        )
        return res.actions, res.cost

    f = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name)),
        # the local solve may contain pallas_call (fk_impl="pallas"/"fused");
        # pallas outputs carry no vma annotation, so the shard_map vma
        # checker must be off for the kernel engines to compose (the
        # program is zero-collective: nothing for the checker to verify)
        check_vma=False,
    )
    return jax.jit(f)


def sharded_dynamic_mpc(
    mesh: Mesh,
    robot,
    ee_link_idx: int,
    horizon: int,
    dt: float = 0.02,
    n_iters: int = 10,
    lr: float = 0.5,
    goal_weight: float = 10.0,
    effort_weight: float = 1e-4,
    eps: float = 1e-8,
    axis_name: str = SCENARIO_AXIS,
    **solver_kwargs,
):
    """Mesh-sharded wrapper of the dof-major batched TORQUE-SPACE MPC solver
    (the dynamics-in-the-loop flagship, trajopt/solvers.py
    solve_dynamic_adam_batch).

    Returns `solve(q0 [B, D], qd0 [B, D], goals [B, 3]) ->
    (actions [B, H, D], cost [B])` with the scenario axis sharded over the
    mesh: each device runs the full forward-dynamics MPC solve on its local
    scenarios — zero collectives, linear scaling, DCN-friendly across
    hosts, exactly like the kinematic wrapper above.

    Defaults match `solve_dynamic_adam_batch` exactly, so the sharded and
    unsharded forms agree bitwise under identical kwargs (deployment runs
    pass eps=1e-1 explicitly — see bench.py and trajopt/solvers.py on why a
    gradient-scale eps is the production setting). Extra keyword arguments
    (`respect_effort_limits`, `use_damping`, `precondition`,
    `rollout_unroll`, `rollout_remat`, ...) forward verbatim to the solver.
    """
    from jax import shard_map

    from ..trajopt.solvers import solve_dynamic_adam_batch

    def local_solve(q0, qd0, goals):
        res = solve_dynamic_adam_batch(
            robot, q0, qd0, goals, ee_link_idx,
            horizon=horizon, dt=dt, n_iters=n_iters, lr=lr,
            goal_weight=goal_weight, effort_weight=effort_weight, eps=eps,
            **solver_kwargs,
        )
        return res.actions, res.cost

    f = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name)),
        check_vma=False,  # pallas engines may run inside (see above)
    )
    return jax.jit(f)


def sharded_mppi(
    mesh: Mesh,
    robot,
    ee_link_idx: int,
    horizon: int,
    axis_name: str = SCENARIO_AXIS,
    **solver_kwargs,
):
    """Mesh-sharded batched MPPI (the sampling solver's multi-chip form).

    Returns `solve(q0 [B, D], qd0 [B, D], goals [B, 3], keys [B]) ->
    (actions [B, H, D], cost [B])`. The per-scenario PRNG keys are an
    ARGUMENT (pre-split at full B, sharded like the scenarios) rather than
    split inside: `solve_dynamic_mppi_batch` splits one key by the local
    batch size, which under sharding is B/n_devices — the same scenario
    would then draw different noise on different mesh sizes, and
    sharded-vs-unsharded equality (the gate this wrapper is tested by,
    __graft_entry__.dryrun_multichip) would be unachievable by design.
    Zero collectives; extra kwargs forward to `solve_dynamic_mppi`.
    """
    from jax import shard_map

    from ..trajopt.solvers import solve_dynamic_mppi

    def local_solve(q0, qd0, goals, keys):
        def one(q0_b, qd0_b, goal_b, key_b):
            res = solve_dynamic_mppi(
                robot, q0_b, qd0_b, goal_b, ee_link_idx, horizon, key_b,
                **solver_kwargs,
            )
            return res.actions, res.cost

        return jax.vmap(one)(q0, qd0, goals, keys)

    f = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(axis_name),) * 4,
        out_specs=(P(axis_name), P(axis_name)),
        check_vma=False,  # pallas engines may run inside (see above)
    )
    return jax.jit(f)


def sharded_fleet_dynamic_mpc(
    mesh: Mesh,
    fleet,
    horizon: int,
    axis_name: str = SCENARIO_AXIS,
    **solver_kwargs,
):
    """Mesh-sharded heterogeneous-fleet torque-space MPC: the padded fleet
    program (models/fleet.solve_fleet_dynamic_adam) with its SCENARIO axis
    sharded over the mesh and the fleet axis replicated.

    Returns `solve(q0 [R, B, Dmax], qd0, goals [R, B, 3]) ->
    (actions [R, B, H, Dmax], cost [R, B])`: each device solves all R
    robots on its local B/n scenarios — fleet heterogeneity costs nothing
    extra to shard because topology is data (every leaf of the fleet
    pytree is a replicated array). Zero collectives; kwargs forward to
    the fleet solver.
    """
    from jax import shard_map

    from ..models.fleet import solve_fleet_dynamic_adam

    def local_solve(q0, qd0, goals):
        res = solve_fleet_dynamic_adam(
            fleet, q0, qd0, goals, horizon=horizon, **solver_kwargs
        )
        return res.actions, res.cost

    f = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(None, axis_name),) * 3,
        out_specs=(P(None, axis_name), P(None, axis_name)),
        check_vma=False,  # pallas engines may run inside (see above)
    )
    return jax.jit(f)


def make_data_parallel_train_step(
    mesh: Mesh,
    loss_fn: Callable,  # loss_fn(params, batch) -> scalar
    optimizer,
    axis_name: str = SCENARIO_AXIS,
):
    """Data-parallel training step: per-shard grads + psum all-reduce.

    The reference's training loops are single-device Adam
    (e.g. examples/learn_dynamics_iiwa.py:81-94); this is the multi-chip
    equivalent. Parameters are replicated; the batch shards over the mesh;
    gradients all-reduce with `jax.lax.pmean` inside `shard_map` (ICI
    collective within a slice).
    """
    from jax import shard_map

    def step(params, opt_state, batch):
        def shard_step(params, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            return loss, grads

        loss, grads = shard_map(
            shard_step,
            mesh=mesh,
            in_specs=(P(), P(axis_name)),
            out_specs=(P(), P()),
        )(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step)
