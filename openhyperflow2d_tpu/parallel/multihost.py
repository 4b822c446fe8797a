"""Multi-host (multi-process) runtime scaffolding.

The reference's MPI layer scatters rank-0's node matrix to worker ranks
and gathers it back every outer cycle (hf2d_start.cpp:142-229,
deeps2d_core.cpp:1679-1758).  The TPU-native replacement has no scatter
at all: every process parses the deck and builds the same host case (the
reference also re-parses on every rank), global arrays are constructed
shard-wise on the device mesh spanning all processes, the jitted chunk
runs SPMD with XLA inserting ICI/DCN collectives, and output assembly is
a per-host shard allgather in grid order (the rank-0 gather equivalent).

Works identically on a real multi-host TPU pod and on the CPU backend
with ``jax.distributed`` + ``--xla_force_host_platform_device_count``
(the idiomatic fake backend for mesh code, SURVEY §4).
"""

from __future__ import annotations

import numpy as np

import jax


def init_distributed(coordinator: str, num_processes: int,
                     process_id: int) -> None:
    """jax.distributed.initialize wrapper (no-op for a single process)."""
    if num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def is_primary() -> bool:
    """The output-writing process (the reference's rank 0)."""
    return jax.process_index() == 0


def make_global_array(np_value, sharding):
    """Build a global jax.Array from identical per-process host data.

    Every process holds the SAME full numpy array (each parses the deck
    and builds the full case, like every MPI rank of the reference);
    each contributes only its addressable shards.
    """
    val = np.asarray(np_value)
    if jax.process_count() == 1:
        return jax.device_put(val, sharding)
    return jax.make_array_from_callback(val.shape, sharding,
                                        lambda idx: val[idx])


def shard_tree_global(tree, mesh):
    """Multi-host replacement for parallel.mesh.shard_tree."""
    from .mesh import spec_for
    from jax.sharding import NamedSharding

    def put(x):
        return make_global_array(
            np.asarray(x), NamedSharding(mesh, spec_for(x, mesh)))
    return jax.tree.map(put, tree)


def gather_to_host(tree):
    """Fetch a (possibly process-spanning) device pytree to full numpy
    arrays on every process — the per-host shard assembly in grid order
    that replaces the reference's rank-0 gather
    (deeps2d_core.cpp:1679-1714)."""
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    from jax.experimental import multihost_utils

    def fetch(x):
        if not hasattr(x, "sharding"):
            return np.asarray(x)
        if x.is_fully_replicated:
            return np.asarray(jax.device_get(
                x.addressable_shards[0].data))
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return jax.tree.map(fetch, tree)


def shard_solver_global(solver, mesh):
    """Reshard a Solver over a (possibly multi-process) mesh and rebuild
    its compiled chunk with sharding-constrained global inputs.

    The chunk is rebuilt with ``meta_as_arg`` (core/step.make_fast_chunk):
    closing over process-spanning arrays is not allowed under jit, so the
    grid metadata becomes a runtime argument and the static ctx is derived
    from it inside the compiled function (once per call)."""
    solver._multihost = True      # before _make_chunk_fn: selects meta-arg
    solver.state = shard_tree_global(solver.state, mesh)
    solver.meta = shard_tree_global(solver.meta, mesh)
    solver.chem = shard_tree_global(solver.chem, mesh)
    solver._src_ext = shard_tree_global(solver._src_ext, mesh)
    solver._chunk_fn = jax.jit(solver._make_chunk_fn(),
                               static_argnums=(1,))
    return solver
