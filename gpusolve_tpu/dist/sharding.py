"""Per-level sharding policy and state distribution.

Each level's padded arrays are partitioned ``P('x','y','z')`` over the mesh
while the per-shard block stays large enough to amortise halo exchange; below
``coarse_cutoff`` interior points per mesh-axis division the level is
replicated (``P()``) — every chip redundantly computes the tiny coarse solves,
eliminating collective traffic where a whole level is smaller than one halo
message (deep hierarchies end at 1³–3³).
"""

from __future__ import annotations

from typing import Optional, Tuple

import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpusolve_tpu.config import GridParams
from gpusolve_tpu.grid import GridState

# Minimum interior points per shard along each mesh-partitioned axis for a
# level to stay distributed.
DEFAULT_COARSE_CUTOFF = 4


def level_shardings(
    params: GridParams,
    mesh: Mesh,
    coarse_cutoff: int = DEFAULT_COARSE_CUTOFF,
) -> Tuple[NamedSharding, ...]:
    """One sharding per level: blocked on fine levels, replicated on coarse.

    The tuple is hashable, so it can be a static argument of the jitted
    V-cycle (gpusolve_tpu.solver.vcycle.vcycle).
    """
    out = []
    msx, msy, msz = mesh.devices.shape
    for (nx, ny, nz) in params.level_dims():
        distributed = (
            nx // msx >= coarse_cutoff
            and ny // msy >= coarse_cutoff
            and nz // msz >= coarse_cutoff
        )
        spec = P("x", "y", "z") if distributed else P()
        out.append(NamedSharding(mesh, spec))
    return tuple(out)


import functools


@functools.partial(jax.jit, static_argnames=("sh",))
def _place(a, sh):
    # jax.device_put rejects unevenly-divisible dims, but the SPMD
    # partitioner handles them (padding internally) — so initial placement
    # goes through a jitted with_sharding_constraint identity instead.
    return jax.lax.with_sharding_constraint(a, sh)


def shard_state(
    state: GridState, shardings: Tuple[NamedSharding, ...]
) -> GridState:
    """Place every level's arrays according to its sharding (initial
    distribution of a freshly built grid)."""
    levels = []
    for lvl, sh in zip(state.levels, shardings):
        levels.append(
            jax.tree_util.tree_map(lambda a: _place(a, sh=sh), lvl)
        )
    newton_f = state.newton_f
    if newton_f is not None:
        newton_f = _place(newton_f, sh=shardings[0])
    return dataclasses.replace(
        state, levels=tuple(levels), newton_f=newton_f
    )
