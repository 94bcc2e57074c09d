"""Horizon-sharded Riccati factorization: the ICI-collective LQR backward.

SURVEY.md §7 calls this the novel axis with no reference analog: the
reference's only "sequence" structure is a sequential Python rollout loop;
here the *factorization over the horizon itself* is distributed. The LQR
backward pass is a reverse composition of conditional-value-function
elements (trajopt/solvers.py: riccati_combine — associative, verified), so
it parallelizes over devices like any suffix scan:

  1. shard the H+1 stage elements over the mesh's horizon axis (each device
     holds a contiguous block of Hb elements);
  2. each device runs the LOCAL log-depth suffix scan over its block;
  3. ONE `all_gather` of the per-block total elements (5 tiny [n,n]/[n]
     tensors per device — a few KB, rides ICI);
  4. each device composes the totals of all LATER blocks (a static
     n_devices-step fold of tiny composes) and applies that suffix to its
     local scan results;
  5. gains are computed locally from the shifted suffixes.

Total communication: one small all-gather per backward pass, independent of
H. Padding uses the composition identity element (A=I, b=0, C=0, eta=0,
J=0), so any H works on any device count.

Tested exactly equal to the single-device parallel Riccati and to the
sequential recursion on the virtual CPU mesh (tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..trajopt.solvers import (
    riccati_combine,
    riccati_gains_from_suffix,
    riccati_stage_elements,
)

HORIZON_AXIS = "horizon"


def _identity_elements(k, n, dtype):
    eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (k, n, n))
    zeros_m = jnp.zeros((k, n, n), dtype)
    zeros_v = jnp.zeros((k, n), dtype)
    return (eye, zeros_v, zeros_m, zeros_v, zeros_m)


def riccati_gains_horizon_sharded(
    mesh: Mesh,
    A, B, lx, lu, lxx, luu, lux, Vx, Vxx,
    axis_name: str = HORIZON_AXIS,
):
    """Distributed twin of solvers._parallel_riccati_gains.

    Stage arrays are [H, ...] host-global; returns (ks [H, m], Ks [H, m, n])
    equal to the sequential Riccati recursion. The horizon axis shards over
    `mesh`'s `axis_name`; the only cross-device communication is one
    all-gather of per-block composed elements.
    """
    H, n = A.shape[0], A.shape[1]
    m = B.shape[2]
    dtype = A.dtype
    if axis_name not in mesh.shape:
        if len(mesh.axis_names) == 1:
            # Any 1-D mesh works regardless of what its axis is called
            # (e.g. the scenario mesh reused for a horizon-sharded solve).
            axis_name = mesh.axis_names[0]
        else:
            raise KeyError(
                f"mesh has no '{axis_name}' axis (axes: {mesh.axis_names})"
            )
    n_dev = mesh.shape[axis_name]
    eye = jnp.eye(n, dtype=dtype)

    elems = riccati_stage_elements(A, B, lx, lu, lxx, luu, lux, Vx, Vxx)  # [H+1]
    pad = (-(H + 1)) % n_dev
    if pad:
        idents = _identity_elements(pad, n, dtype)
        elems = jax.tree_util.tree_map(
            lambda e, i: jnp.concatenate([e, i]), elems, idents
        )
    Hp = H + 1 + pad

    def local(elems_blk):
        # 2. local suffix scan over this device's block
        suffix = jax.lax.associative_scan(
            lambda ej, ei: riccati_combine(ej, ei, eye), elems_blk, reverse=True
        )
        block_total = jax.tree_util.tree_map(lambda s: s[:1], suffix)

        # 3. all-gather block totals: [n_dev, 1, ...] -> [n_dev, ...]
        totals = jax.lax.all_gather(block_total, axis_name)
        totals = jax.tree_util.tree_map(lambda t: t[:, 0], totals)

        # 4. fold totals of all LATER blocks (right fold, earliest last)
        my = jax.lax.axis_index(axis_name)
        T = _identity_elements(1, n, dtype)
        T = jax.tree_util.tree_map(lambda t: t[0], T)
        for i in range(n_dev - 1, 0, -1):
            ti = jax.tree_util.tree_map(lambda t: t[i], totals)
            T_new = riccati_combine(T, ti, eye)
            take = i > my
            T = jax.tree_util.tree_map(
                lambda a, b: jnp.where(take, a, b), T_new, T
            )

        # apply the later-blocks suffix to every local suffix entry
        T_b = jax.tree_util.tree_map(lambda t: t[None], T)
        full_suffix = riccati_combine(
            jax.tree_util.tree_map(
                lambda t: jnp.broadcast_to(t, (elems_blk[0].shape[0],) + t.shape[1:]),
                T_b,
            ),
            suffix,
            eye,
        )

        # 5. V_{k+1} for each local k: shift by one within the block; the
        # last local index takes the later-blocks suffix itself.
        shifted = jax.tree_util.tree_map(
            lambda s, t: jnp.concatenate([s[1:], t[None]]), full_suffix, T
        )
        return shifted

    # No jit wrapper: this composes under an outer jit/scan (e.g. inside
    # ilqr's iteration loop with riccati="horizon_sharded") where a nested
    # jit would be inlined anyway, and works eagerly for direct calls.
    shifted = shard_map(
        local,
        mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: P(axis_name), elems),),
        out_specs=jax.tree_util.tree_map(lambda _: P(axis_name), elems),
    )(elems)

    P_suf = shifted[4][:H]  # J of V_{k+1}
    p_suf = shifted[3][:H]  # eta of V_{k+1}
    return riccati_gains_from_suffix(A, B, lu, luu, lux, P_suf, p_suf)
