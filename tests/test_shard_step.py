"""Explicit shard_map+ppermute halo path vs single-device results."""

import numpy as np
import pytest

import jax

from openhyperflow2d_tpu.examples import channel_deck, reacting_rans_deck
from openhyperflow2d_tpu.parallel.mesh import make_mesh
from openhyperflow2d_tpu.parallel.shard_step import make_shard_chunk
from openhyperflow2d_tpu.solver.init import build_case
from openhyperflow2d_tpu.solver.runner import Solver


def _shard_solver(solver, n_devices):
    mesh = make_mesh(n_devices)
    solver._chunk_fn = jax.jit(make_shard_chunk(
        solver.meta, solver.params, solver.chem,
        (solver.beta_xs, solver.beta_ys), (solver.cfl_xs, solver.cfl_ys),
        solver.params.TurbStartIter, mesh),
        static_argnums=(1,))
    return solver


@pytest.mark.parametrize("n_devices", [2, 4])
def test_shard_step_matches_reference_path(n_devices):
    deck = channel_deck(nx=64, ny=32, mach2_v=-100.0)
    ref = Solver(build_case(deck))
    ref.run_iters(10)

    sh = _shard_solver(Solver(build_case(
        channel_deck(nx=64, ny=32, mach2_v=-100.0))), n_devices)
    d = sh.run_iters(10)
    assert not np.asarray(d["unstable"]).any()
    # exact dt pairing is preserved on this path (pmin mid-iteration), so
    # agreement is to numerical associativity only
    for f in ["S", "beta", "U", "V", "p", "Tg"]:
        a = np.asarray(getattr(ref.state, f))
        b = np.asarray(getattr(sh.state, f))
        np.testing.assert_allclose(b, a, rtol=1e-10, atol=1e-8)


def test_shard_step_reacting_rans():
    sh = _shard_solver(Solver(build_case(reacting_rans_deck(64, 32))), 4)
    ref = Solver(build_case(reacting_rans_deck(64, 32)))
    d = sh.run_iters(8)
    ref.run_iters(8)
    assert not np.asarray(d["unstable"]).any()
    np.testing.assert_allclose(np.asarray(sh.state.S),
                               np.asarray(ref.state.S),
                               rtol=1e-10, atol=1e-8)


def test_shard_step_uneven_x():
    """X not divisible by the device count exercises strip padding."""
    sh = _shard_solver(Solver(build_case(channel_deck(nx=50, ny=32))), 4)
    ref = Solver(build_case(channel_deck(nx=50, ny=32)))
    sh.run_iters(6)
    ref.run_iters(6)
    np.testing.assert_allclose(np.asarray(sh.state.p),
                               np.asarray(ref.state.p),
                               rtol=1e-10, atol=1e-6)


def _pallas_shard_solver(solver, n_devices, fuse=2, tile=(16, 16),
                         overlap=False):
    from openhyperflow2d_tpu.parallel.shard_step import \
        make_pallas_shard_chunk
    mesh = make_mesh(n_devices)
    solver._chunk_fn = jax.jit(make_pallas_shard_chunk(
        solver.meta, solver.params, solver.chem,
        (solver.beta_xs, solver.beta_ys), (solver.cfl_xs, solver.cfl_ys),
        solver.params.TurbStartIter, mesh,
        tile=tile, fuse_iters=fuse, overlap=overlap),
        static_argnums=(1,))
    return solver


@pytest.mark.parametrize("n_devices,fuse", [(2, 2), (4, 3)])
def test_pallas_shard_matches_single_pallas(n_devices, fuse):
    """Multi-chip fused kernel == single-device fused kernel (same dt
    freezing, so agreement is bitwise up to reduction associativity)."""
    mk = lambda: build_case(reacting_rans_deck(64, 32))   # noqa: E731
    ref = Solver(mk(), use_pallas=True, pallas_tile=(16, 16),
                 pallas_fuse=fuse)
    ref.run_iters(7)     # 7-1 = 6: exercises remainder for fuse=4
    sh = _pallas_shard_solver(Solver(mk()), n_devices, fuse=fuse)
    d = sh.run_iters(7)
    assert not np.asarray(d["unstable"]).any()
    for f in ["S", "beta", "U", "V", "p", "Tg"]:
        a = np.asarray(getattr(ref.state, f))
        b = np.asarray(getattr(sh.state, f))
        np.testing.assert_allclose(b, a, rtol=1e-10, atol=1e-8, err_msg=f)
    r1 = np.asarray(ref.run_iters(1)["RMS"])
    r2 = np.asarray(sh.run_iters(1)["RMS"])
    np.testing.assert_allclose(r2, r1, rtol=1e-8, atol=1e-12)


@pytest.mark.parametrize("n_devices,fuse", [(2, 3), (4, 2)])
def test_pallas_shard_overlap_matches_single_pallas(n_devices, fuse):
    """overlap=True (edge strips through the XLA stages + ppermute in
    flight under the interior kernel — the reference's Isend/Irecv ->
    work -> Wait, deeps2d_core.cpp:1336-1409) must agree with the
    single-device fused kernel like the non-overlapped path does: the
    edge strips run the SAME stage functions the kernel fuses, so the
    deviation is ulp-level compiler noise (the edge strips and the
    kernel are separate XLA compilations with independent FMA-contraction
    decisions).  beta gets a wider atol: the BFF sqrt(|residual|) has
    infinite slope at 0, so a ~1e-13 ulp difference in a converged
    node's residual legitimately becomes ~3e-7 of beta."""
    mk = lambda: build_case(reacting_rans_deck(64, 32))   # noqa: E731
    ref = Solver(mk(), use_pallas=True, pallas_tile=(16, 16),
                 pallas_fuse=fuse)
    ref.run_iters(7)
    sh = _pallas_shard_solver(Solver(mk()), n_devices, fuse=fuse,
                              overlap=True)
    d = sh.run_iters(7)
    assert not np.asarray(d["unstable"]).any()
    for f in ["S", "beta", "U", "V", "p", "Tg"]:
        a = np.asarray(getattr(ref.state, f))
        b = np.asarray(getattr(sh.state, f))
        atol = 3e-6 if f == "beta" else 1e-8
        np.testing.assert_allclose(b, a, rtol=1e-10, atol=atol, err_msg=f)
    r1 = np.asarray(ref.run_iters(1)["RMS"])
    r2 = np.asarray(sh.run_iters(1)["RMS"])
    np.testing.assert_allclose(r2, r1, rtol=1e-8, atol=1e-12)


def test_pallas_shard_overlap_uneven_x():
    sh = _pallas_shard_solver(
        Solver(build_case(channel_deck(nx=50, ny=32))), 4, fuse=2,
        overlap=True)
    ref = Solver(build_case(channel_deck(nx=50, ny=32)),
                 use_pallas=True, pallas_tile=(16, 16), pallas_fuse=2)
    sh.run_iters(5)
    ref.run_iters(5)
    np.testing.assert_allclose(np.asarray(sh.state.p),
                               np.asarray(ref.state.p),
                               rtol=1e-10, atol=1e-8)


def test_pallas_shard_uneven_x():
    sh = _pallas_shard_solver(
        Solver(build_case(channel_deck(nx=50, ny=32))), 4, fuse=2)
    ref = Solver(build_case(channel_deck(nx=50, ny=32)),
                 use_pallas=True, pallas_tile=(16, 16), pallas_fuse=2)
    sh.run_iters(5)
    ref.run_iters(5)
    np.testing.assert_allclose(np.asarray(sh.state.p),
                               np.asarray(ref.state.p),
                               rtol=1e-10, atol=1e-8)
