"""Golden-field regression for the Wedge (NS + k-eps) and Step decks.

Fixtures were produced with the reference serial build (see VALIDATION.md):
Wedge.dat with Nmax=100, Step.dat with Nmax=200 (NOutStep=1, single cycle).
The deck patches applied to the golden runs (iteration counts) are repeated
here on the parsed deck — the physics configuration is untouched.

Tolerances follow the measured chaotic-sensitivity envelope (see
test_golden_obliqueshock.py): bulk mean error ~1e-5; pointwise max a few
percent at singular corners (wedge tip / step corner).
"""

import os

import numpy as np
import pytest

from openhyperflow2d_tpu.config.deck import load_deck
from openhyperflow2d_tpu.solver.init import build_case
from openhyperflow2d_tpu.solver.runner import Solver

HERE = os.path.dirname(__file__)
TESTCASES = "/root/reference/OpenHyperFLOW2D/TestCases"


def _run(deck_name, iters):
    deck = load_deck(os.path.join(TESTCASES, deck_name))
    case = build_case(deck, serial_dt_mode=True)
    s = Solver(case)
    d = s.run_iters(iters)
    assert not np.asarray(d["unstable"]).any()
    return s.host_state(), case


@pytest.mark.slow
def test_wedge_ns_keps_100_iters():
    st, case = _run("Wedge.dat", 100)
    g = np.load(os.path.join(HERE, "golden", "wedge_golden.npz"))
    rho = np.asarray(st.S[0])
    checks = {
        "p": (np.asarray(st.p), 5e-2, 2e-5),
        "U": (np.asarray(st.U), 5e-2, 2e-5),
        "V": (np.asarray(st.V), 5e-2, 5e-5),
        "T": (np.asarray(st.Tg), 5e-2, 2e-5),
        "Rho": (rho, 5e-2, 2e-5),
    }
    for name, (mine, tol_max, tol_mean) in checks.items():
        ref = g[name]
        err = np.abs(mine - ref) / np.abs(ref).max()
        assert err.max() < tol_max, (name, err.max())
        assert err.mean() < tol_mean, (name, err.mean())
    # turbulence field: bulk agreement (corners of the farfield are noisy)
    mu = np.asarray(st.mu)
    mtm = np.where(mu != 0, np.asarray(st.mu_t) / np.where(mu != 0, mu, 1),
                   0.0)
    err = np.abs(mtm - g["mu_t_mu"]) / max(np.abs(g["mu_t_mu"]).max(), 1e-30)
    assert err.mean() < 5e-3, err.mean()


@pytest.mark.slow
def test_step_euler_200_iters():
    st, case = _run("Step.dat", 200)
    g = np.load(os.path.join(HERE, "golden", "step_golden.npz"))
    for name, mine in [("p", st.p), ("U", st.U), ("V", st.V),
                       ("T", st.Tg), ("Rho", st.S[0])]:
        ref = g[name]
        err = np.abs(np.asarray(mine) - ref) / np.abs(ref).max()
        assert err.max() < 1e-1, (name, err.max())
        assert err.mean() < 5e-4, (name, err.mean())


@pytest.mark.slow
def test_triplepoint_axisymmetric_50_iters():
    # The shipped TriplePoint deck is missing several required keys and
    # aborts in the reference too; the golden run patched them in (same
    # patch here) — isAlternateRMS/isIgnoreUnsetNodes/beta_NonReflectedBC/
    # MonitorIndex/NumMonitorPoints/ExitMonitorValue.
    deck = load_deck(os.path.join(TESTCASES, "TriplePoint.dat"))
    deck.data.setdefault("isAlternateRMS", "1")
    deck.data.setdefault("isIgnoreUnsetNodes", "0")
    deck.data.setdefault("beta_NonReflectedBC", "0.25")
    deck.data.setdefault("MonitorIndex", "5")
    deck.data.setdefault("NumMonitorPoints", "0")
    deck.data.setdefault("ExitMonitorValue", "1e-12")
    case = build_case(deck, serial_dt_mode=True)
    s = Solver(case)
    d = s.run_iters(50)
    assert not np.asarray(d["unstable"]).any()
    st = s.host_state()
    g = np.load(os.path.join(HERE, "golden", "triplepoint_golden.npz"))
    for name, mine in [("p", st.p), ("U", st.U), ("V", st.V),
                       ("T", st.Tg), ("Rho", st.S[0])]:
        ref = g[name]
        err = np.abs(np.asarray(mine) - ref) / np.abs(ref).max()
        assert err.max() < 2e-2, (name, err.max())
        assert err.mean() < 1e-5, (name, err.mean())


@pytest.mark.slow
@pytest.mark.skipif(not os.environ.get("HF2D_LONG_GOLDEN"),
                    reason="~10 min: set HF2D_LONG_GOLDEN=1 to run")
def test_wedge_ns_keps_2000_iters():
    """Long-horizon NS+k-eps: 2000 iterations vs the serial reference.

    Measured envelope (float64, serial_dt_mode): mean rel err 1.3-4.4e-5,
    corr >= 0.999996 on p/U/V/T/Rho; mu_t/mu mean 5.4e-4 (chaotic
    amplification along the shock/boundary-layer feet, see VALIDATION.md)."""
    st, case = _run("Wedge.dat", 2000)
    g = np.load(os.path.join(HERE, "golden", "wedge2000_golden.npz"))
    for name, mine in [("p", st.p), ("U", st.U), ("V", st.V),
                       ("T", st.Tg), ("Rho", st.S[0])]:
        ref = g[name].astype(np.float64)
        err = np.abs(np.asarray(mine) - ref) / np.abs(ref).max()
        corr = np.corrcoef(np.asarray(mine).ravel(), ref.ravel())[0, 1]
        assert err.mean() < 2e-4, (name, err.mean())
        assert corr > 0.9999, (name, corr)
