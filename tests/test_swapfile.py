"""Reference .hf2d swap-file round trip + resume compatibility."""

import os

import numpy as np
import pytest

from openhyperflow2d_tpu.config.deck import load_deck
from openhyperflow2d_tpu.examples import channel_deck
from openhyperflow2d_tpu.io_out.swapfile import (read_swap_file,
                                                 state_from_swap,
                                                 write_swap_file)
from openhyperflow2d_tpu.solver.init import build_case
from openhyperflow2d_tpu.solver.runner import Solver

GOLDEN_SWAP = "/tmp/golden/OS500/ObliqueShock.hf2d"
GOLDEN_RESUME_PLT = "/tmp/golden/OS500resume/ObliqueShock.plt"


def test_swap_roundtrip(tmp_path):
    deck = channel_deck(nx=32, ny=24)
    case = build_case(deck)
    s = Solver(case)
    s.run_iters(10)
    s.global_time = 3.3e-6
    path = str(tmp_path / "x.hf2d")
    write_swap_file(path, s, case.grid)
    assert os.path.getsize(path) == 32 * 24 * 1248

    d = read_swap_file(path, 32, 24)
    st = s.host_state()
    np.testing.assert_array_equal(d["S"], np.asarray(st.S))
    np.testing.assert_array_equal(d["beta"], np.asarray(st.beta))
    np.testing.assert_array_equal(d["U"], np.asarray(st.U))
    np.testing.assert_array_equal(d["CT"],
                                  case.grid.CT.astype(np.uint64))
    assert d["time"][0, 0] == pytest.approx(3.3e-6)

    # loading it back reproduces the state bit-exactly
    s2 = Solver(build_case(channel_deck(nx=32, ny=24)))
    state_from_swap(path, s2)
    np.testing.assert_array_equal(np.asarray(s2.state.S), np.asarray(st.S))
    np.testing.assert_array_equal(np.asarray(s2.state.A), np.asarray(st.A))


@pytest.mark.slow
@pytest.mark.skipif(not (os.path.exists(GOLDEN_SWAP)
                         and os.path.exists(GOLDEN_RESUME_PLT)),
                    reason="reference golden swap not generated on this "
                           "machine (see VALIDATION.md)")
def test_resume_from_reference_swap():
    """Start from the reference's own 500-step binary checkpoint, advance
    101 steps, compare against the reference resumed the same way.  Both
    runs share the bit-identical start state, so differences are pure
    stepping divergence (chaotic corner oscillation only)."""
    from openhyperflow2d_tpu.io_out.tecplot import read_tecplot_zone
    deck = load_deck(
        "/root/reference/OpenHyperFLOW2D/TestCases/ObliqueShock.dat")
    case = build_case(deck, serial_dt_mode=True)
    s = Solver(case)
    state_from_swap(GOLDEN_SWAP, s)
    d = s.run_iters(101)
    assert not np.asarray(d["unstable"]).any()
    st = s.host_state()
    g = read_tecplot_zone(GOLDEN_RESUME_PLT, 320, 80)
    for name, mine in [("p", st.p), ("U", st.U), ("Rho", st.S[0])]:
        err = np.abs(np.asarray(mine) - g[name]) / np.abs(g[name]).max()
        assert err.mean() < 1e-4, (name, err.mean())
        assert err.max() < 3e-2, (name, err.max())
