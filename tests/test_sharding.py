"""SPMD sharding tests on the virtual 8-device CPU mesh.

The sharded solver must produce bit-identical (same dtype, same op order)
results to the single-device run — XLA GSPMD only changes data placement
and inserts halo collectives for the stencil shifts.
"""

import numpy as np
import pytest

import jax

from openhyperflow2d_tpu.examples import channel_deck, reacting_rans_deck
from openhyperflow2d_tpu.parallel.mesh import make_mesh, shard_solver
from openhyperflow2d_tpu.solver.init import build_case
from openhyperflow2d_tpu.solver.runner import Solver


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_sharded_matches_single_device(n_devices):
    deck = channel_deck(nx=64, ny=32, mach2_v=-100.0)
    case = build_case(deck)
    ref = Solver(case)
    ref.run_iters(10)
    ref_S = np.asarray(ref.state.S)

    case2 = build_case(deck)
    sh = Solver(case2)
    mesh = make_mesh(n_devices)
    shard_solver(sh, mesh)
    sh.run_iters(10)
    got_S = np.asarray(sh.state.S)

    np.testing.assert_allclose(got_S, ref_S, rtol=1e-12, atol=1e-12)


def test_sharded_state_is_distributed():
    deck = channel_deck(nx=64, ny=32)
    case = build_case(deck)
    s = Solver(case)
    mesh = make_mesh(4)
    shard_solver(s, mesh)
    shards = s.state.S.addressable_shards
    assert len(shards) == 4
    # X axis strip-partitioned
    assert shards[0].data.shape == (9, 16, 32)
    s.run_iters(2)
    assert len(s.state.S.addressable_shards) == 4


def test_2d_mesh_matches_single_device():
    """(2,4) X-by-Y mesh (BASELINE.json's 'SPMD 2D mesh' north star):
    GSPMD shards both spatial axes — spec_for emits P(None,'x','y') —
    and the result stays bit-identical to single-device."""
    deck = channel_deck(nx=64, ny=32, mach2_v=-100.0)
    ref = Solver(build_case(deck))
    ref.run_iters(10)
    ref_S = np.asarray(ref.state.S)

    sh = Solver(build_case(deck))
    mesh = make_mesh(8, axis_names=("x", "y"), shape=(2, 4))
    shard_solver(sh, mesh)
    shards = sh.state.S.addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (9, 32, 8)   # X/2, Y/4 tiles
    sh.run_iters(10)
    np.testing.assert_allclose(np.asarray(sh.state.S), ref_S,
                               rtol=1e-12, atol=1e-12)


def test_reacting_rans_sharded_runs():
    deck = reacting_rans_deck(64, 32)
    case = build_case(deck)
    s = Solver(case)
    shard_solver(s, make_mesh(8))
    d = s.run_iters(5)
    assert not np.asarray(d["unstable"]).any()
    assert np.isfinite(np.asarray(d["RMS"])).all()
    # turbulence model active: mu_t should be nonzero somewhere
    assert np.abs(np.asarray(s.state.mu_t)).max() > 0
