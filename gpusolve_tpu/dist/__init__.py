"""Multi-chip 3-D spatial domain decomposition.

The reference is single-process, single-device (SURVEY.md §2.3); this layer is
the distribution capability the TPU build adds per BASELINE.json: each grid
level is block-partitioned over a 3-D ``jax.sharding.Mesh`` of chips.  The
stencil/transfer ops in gpusolve_tpu.ops are written as shifted-slice
arithmetic, so under ``jit`` with sharded operands the XLA SPMD partitioner
inserts the one-cell halo-exchange collective-permutes automatically — the
same traced V-cycle runs single-chip or pod-sliced.

Coarse levels below a per-shard size threshold are explicitly *replicated*
(every chip redundantly smooths the tiny coarse grids): the multigrid analogue
of pipeline-stage consolidation, avoiding halo messages larger than the level
itself (SURVEY.md §5 "long-context" note).

Planned round-2 optimization — explicit shard_map halo engine: replace the
partitioner-inserted collectives with hand-scheduled ``lax.ppermute`` face
exchanges (6 per stencil application) inside ``shard_map``, double-buffered
so interior Pallas compute overlaps the permutes, with mesh-aware per-level
allocation (coarse alloc = fine alloc / 2 for the distributed levels, so
restriction/prolongation stay shard-local given a 1-cell halo) and an
``all_gather`` consolidation at the replication cutoff.  The GSPMD path here
is the functional baseline it will be benchmarked against.
"""

from gpusolve_tpu.dist.mesh import factor_devices, make_mesh
from gpusolve_tpu.dist.sharding import level_shardings, shard_state

__all__ = ["factor_devices", "make_mesh", "level_shardings", "shard_state"]
