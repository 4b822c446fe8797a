"""Golden-field regression vs the reference C++ solver.

Fixtures in tests/golden/ were produced by building the reference at
/root/reference/OpenHyperFLOW2D (serial, GNU, FP=double) and running the
shipped ObliqueShock deck with Nmax=50 / Nmax=500 (NOutStep=1,
ExitMonitorValue=1e-9 to force a single cycle).

The reference writes Tecplot ASCII with 6 significant digits, so ~1e-6
relative error is the comparison floor.  Through 50 iterations the Jacobi
update matches the serial sweep to that floor; by 500 iterations a standing
odd-even oscillation at the outflow corner (a singular BC point present in
both codes) grows chaotic differences localized to the last few columns —
the bulk field still matches to ~1e-4.
"""

import gzip
import os
import shutil

import numpy as np
import pytest

from openhyperflow2d_tpu.config.deck import load_deck
from openhyperflow2d_tpu.io_out.tecplot import read_tecplot_zone
from openhyperflow2d_tpu.solver.init import build_case
from openhyperflow2d_tpu.solver.runner import Solver

HERE = os.path.dirname(__file__)
DECK = "/root/reference/OpenHyperFLOW2D/TestCases/ObliqueShock.dat"


def _load_golden(name, tmp_path):
    src = os.path.join(HERE, "golden", name + ".plt.gz")
    dst = str(tmp_path / (name + ".plt"))
    with gzip.open(src, "rb") as f_in, open(dst, "wb") as f_out:
        shutil.copyfileobj(f_in, f_out)
    return read_tecplot_zone(dst, 320, 80)


@pytest.fixture(scope="module")
def solver_500():
    deck = load_deck(DECK)
    case = build_case(deck, serial_dt_mode=True)
    s = Solver(case)
    return s


def test_golden_50_iters(solver_500, tmp_path):
    s = solver_500
    assert s.last_iter == 0
    d = s.run_iters(50)
    assert not np.asarray(d["unstable"]).any()
    g = _load_golden("ObliqueShock_50", tmp_path)
    st = s.host_state()
    for name, mine in [("p", st.p), ("U", st.U), ("V", st.V),
                       ("T", st.Tg), ("Rho", st.S[0])]:
        ref = g[name]
        err = np.abs(np.asarray(mine) - ref) / np.abs(ref).max()
        assert err.max() < 2e-5, (name, err.max())


def test_golden_500_iters(solver_500, tmp_path):
    s = solver_500
    s.run_iters(500 - s.last_iter)
    g = _load_golden("ObliqueShock_500", tmp_path)
    st = s.host_state()
    for name, mine in [("p", st.p), ("U", st.U), ("Rho", st.S[0])]:
        ref = g[name]
        err = np.abs(np.asarray(mine) - ref) / np.abs(ref).max()
        # bulk field (excluding the outflow-corner oscillation columns)
        assert err[:300, :].max() < 1e-4, (name, err[:300, :].max())
        assert err.mean() < 1e-4, (name, err.mean())
