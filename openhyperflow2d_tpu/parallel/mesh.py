"""SPMD device-mesh sharding for the solver state.

The reference parallelizes by 1-D strip decomposition along X with 1-column
halo exchange over MPI (SURVEY §2.8, deeps2d_core.cpp:1336-1399).  Here the
same decomposition is expressed declaratively: every (…, X, Y) plane is
sharded along X (optionally X×Y for a 2-D mesh) with ``jax.sharding``;
XLA's SPMD partitioner turns the stencil shifts of core/step.py into
collective-permute halo exchanges over ICI and the ``jnp.min``/``jnp.sum``
reductions into psum/pmin trees — no hand-written communication.

``shard_solver`` rewraps a Solver's state/meta/step under the mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = None, devices=None, axis_names=("x",),
              shape=None):
    """1-D (or 2-D) device mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    devices = np.asarray(devices)
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
    return Mesh(devices.reshape(shape), axis_names)


def spec_for(arr, mesh: Mesh):
    """PartitionSpec for a solver array: shard the X axis (second-to-last)
    across the 'x' mesh axis; replicate everything else."""
    axes = mesh.axis_names
    nd = getattr(arr, "ndim", 0)
    if nd >= 2:
        lead = [None] * (nd - 2)
        px = "x" if "x" in axes else None
        py = "y" if "y" in axes else None
        return P(*lead, px, py)
    return P()


def shard_tree(tree, mesh: Mesh):
    """device_put a pytree with per-leaf shardings."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, spec_for(x, mesh)))
    return jax.tree.map(put, tree)


def shard_solver(solver, mesh: Mesh):
    """Reshard an existing Solver's device state over the mesh and rebuild
    its compiled chunk function with sharding-annotated inputs."""
    solver.state = shard_tree(solver.state, mesh)
    solver.meta = shard_tree(solver.meta, mesh)
    solver.chem = shard_tree(solver.chem, mesh)
    solver._src_ext = shard_tree(solver._src_ext, mesh)
    solver._chunk_fn = jax.jit(solver._make_chunk_fn(),
                               static_argnums=(1,))
    return solver
