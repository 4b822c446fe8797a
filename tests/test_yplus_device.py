"""On-device y+ recalc == host oracle (no full-field D2H per cycle)."""

import numpy as np

from openhyperflow2d_tpu.examples import channel_deck
from openhyperflow2d_tpu.solver.init import build_case
from openhyperflow2d_tpu.solver.runner import Solver


def test_device_yplus_matches_host_oracle():
    deck = channel_deck(nx=64, ny=32, problem_type=1, turb_model=4,
                        turb_ext_model=4, with_rect=True)
    case = build_case(deck)
    s = Solver(case)
    assert len(case.wall_nodes) > 0
    s.run_iters(6)
    want = s.recalc_y_plus_host()
    s.recalc_y_plus()
    got = np.asarray(s.state.y_plus)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-300)


def test_run_cycle_no_host_roundtrip(monkeypatch):
    """run_cycle must not call host_state for the y+ update."""
    deck = channel_deck(nx=64, ny=32, problem_type=1, turb_model=4,
                        turb_ext_model=4, with_rect=True, nmax=5)
    case = build_case(deck)
    s = Solver(case)
    calls = []
    orig = Solver.host_state
    monkeypatch.setattr(Solver, "host_state",
                        lambda self: calls.append(1) or orig(self))
    s.run_cycle()
    assert not calls, "run_cycle fetched the full state to host"
