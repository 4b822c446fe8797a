"""Checkpoint / resume: the swap-file analog.

The reference persists the whole node matrix in an mmap'ed binary
(`<Project>.hf2d`, obj_data.cpp:117-319) and resumes by skipping
re-initialization (`PreloadFlag`, deeps2d_core.cpp:3197-3240) with
`GlobalTime` recovered from node (0,0) (4618-4621).

Here the checkpoint is a compressed npz of the dynamic SolverState (the
static GridMeta is rebuilt from the deck, which is cheaper and
deterministic) plus run metadata (iteration count, global time).  Restore
validates grid shape like the reference validates file size.
"""

from __future__ import annotations

import dataclasses

import numpy as np


CHECKPOINT_VERSION = 1


def save_checkpoint(path: str, solver, st=None) -> None:
    """Persist solver dynamic state + bookkeeping.

    ``st``: optionally a pre-fetched host state (under a multi-process
    mesh host_state() is a collective — fetch on all processes, write on
    the primary only)."""
    state = st if st is not None else solver.host_state()
    arrays = {f.name: np.asarray(getattr(state, f.name))
              for f in dataclasses.fields(state)}
    np.savez_compressed(
        path,
        __version=np.asarray(CHECKPOINT_VERSION),
        __last_iter=np.asarray(solver.last_iter),
        __global_time=np.asarray(solver.global_time),
        __shape=np.asarray([solver.params.MaxX, solver.params.MaxY]),
        **arrays)


def load_checkpoint(path: str, solver) -> None:
    """Restore a checkpoint into an initialized Solver (the PreloadFlag
    path: geometry/BC setup ran, dynamic fields are overwritten)."""
    import jax.numpy as jnp

    with np.load(path) as z:
        shape = z["__shape"]
        if (int(shape[0]), int(shape[1])) != (solver.params.MaxX,
                                              solver.params.MaxY):
            raise ValueError(
                f"checkpoint grid {tuple(shape)} != case grid "
                f"{(solver.params.MaxX, solver.params.MaxY)}")
        dtype = solver.params.jdtype
        kw = {}
        for f in dataclasses.fields(solver.state):
            kw[f.name] = jnp.asarray(z[f.name], dtype)
        solver.state = type(solver.state)(**kw)
        solver.last_iter = int(z["__last_iter"])
        solver.global_time = float(z["__global_time"])
