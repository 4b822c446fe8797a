"""Solver-step invariance and sanity tests."""

import numpy as np
import pytest

from openhyperflow2d_tpu.config.deck import parse_deck
from openhyperflow2d_tpu.core import flags as fl
from openhyperflow2d_tpu.solver.init import build_case
from openhyperflow2d_tpu.solver.runner import Solver

AIR_TABLES = """
<data/H_cp=0.0>
<data/R_cp=428.59>
<table=lam_cp/2>
300. 0.026
3000. 0.38
<endtable>
<table=mu_cp/2>
300. 1.8e-5
3000. 9e-5
<endtable>
<table=Cp_cp/2>
300. 1557.
3000. 1924.
<endtable>
<data/H_Fuel=0.0>
<data/R_Fuel=4157.0>
<table=lam_Fuel/2>
220. 0.15
1000. 0.45
<endtable>
<table=mu_Fuel/2>
20. 2.5e-6
2000. 33.6e-6
<endtable>
<table=Cp_Fuel/2>
20. 10000.
1500. 16050.
<endtable>
<data/H_OX=0.0>
<data/R_OX=290.0>
<table=lam_OX/2>
200. 0.018
1800. 0.116
<endtable>
<table=mu_OX/2>
200. 1.3e-5
1800. 6e-5
<endtable>
<table=Cp_OX/2>
200. 1052.
1800. 1398.
<endtable>
<data/H_air=0.>
<data/R_air=287.05>
<table=lam_air/2>
90. 0.015
3500. 0.17341
<endtable>
<table=mu_air/2>
90. 5.0e-6
3500. 93.149e-6
<endtable>
<table=Cp_air/2>
90. 1004.
3500. 1004.
<endtable>
"""


def freestream_deck(problem_type=0, u=500.0, v=0.0, nx=16, ny=16):
    return parse_deck(f"""
<start/FreeStream>
<data/ProjectName=FreeStream>
<data/isVerboseOutput=0>
<data/BFF=4>
<data/MaxX={nx}>
<data/MaxY={ny}>
<data/dx=0.01>
<data/dy=0.01>
<data/SigW=1.0>
<data/SigF=1.0>
<data/delta_bl=0>
<data/TurbulenceModel=0>
<data/TurbStartIter=1>
<data/TurbExtModel=0>
<data/isTurbulenceReset=1>
<data/FlowType=0>
<data/ProblemType={problem_type}>
<data/CFL=0.5>
<table=CFL_Scenario/1>
0 0.5
<endtable>
<data/NSaveStep=1>
<data/Nmax=100>
<data/NOutStep=10>
<data/isAlternateRMS=1>
<data/isIgnoreUnsetNodes=0>
<data/MonitorIndex=0>
<data/ExitMonitorValue=1e-10>
<data/NumMonitorPoints=0>
<data/beta=0.98>
<data/beta_NonReflectedBC=0.25>
<table=beta_Scenario/1>
0 0.98
<endtable>
<data/K0=34.>
<data/gamma=0.>
<data/Tf=1000.>
<data/isAdiabaticWall=1>
{AIR_TABLES}
<data/Ts0=300.>
<data/NumFlow=0>
<data/NumFlow2D=1>
<data/Flow2D-1.CompIndex=3>
<data/Flow2D-1.Mode=0>
<data/Flow2D-1.p=100000.0>
<data/Flow2D-1.T=300.0>
<data/Flow2D-1.U={u}>
<data/Flow2D-1.V={v}>
<data/NumRects=0>
<data/NumCircles=0>
<data/NumSingleBounds=0>
<data/NumAirfoils=0>
<data/NumContour=1>
<table=Contour1/4>
0.0   {ny * 0.01}
{nx * 0.01} {ny * 0.01}
{nx * 0.01} 0.0
0.0   0.0
<endtable>
<data/Contour1.MaterialID=0>
<data/Contour1.Bound1.Cond=NT_FC_2D>
<data/Contour1.Bound2.Cond=NT_FC_2D>
<data/Contour1.Bound3.Cond=NT_FC_2D>
<data/Contour1.Bound4.Cond=NT_FC_2D>
<data/Contour1.Bound1.Flow2D=1>
<data/Contour1.Bound2.Flow2D=1>
<data/Contour1.Bound3.Flow2D=1>
<data/Contour1.Bound4.Flow2D=1>
<data/Contour1.Bound1.TurbulenceModel=0>
<data/Contour1.Bound2.TurbulenceModel=0>
<data/Contour1.Bound3.TurbulenceModel=0>
<data/Contour1.Bound4.TurbulenceModel=0>
<data/Contour1.Bound1.isReset=0>
<data/Contour1.Bound2.isReset=0>
<data/Contour1.Bound3.isReset=0>
<data/Contour1.Bound4.isReset=0>
<data/NumArea=1>
<table=Area1/1>
3 3
<endtable>
<data/Area1.Type=1>
<data/Area1.Flow2D=1>
<data/InitTime=0.>
<data/NumSrc=0>
<data/NumXCut=0>
<data/is_Cx_calc=0>
<data/is_Cd_calc=0>
<data/isOutHeatFluxX=0>
<data/isOutHeatFluxY=0>
<data/is_p_asterisk_out=0>
<data/isIgnoreUnsetNodes=0>
<data/isSingleGPU=0>
<data/ActiveSingleGPU=0>
<data/ThreadBlockSize=0>
<data/isRecalcYplus=0>
<data/GasSwapFile=.hf2d>
<data/OutputFile=.plt>
<data/ErrorFile=-err.plt>
<data/isAdiabaticWall=1>
<end/FreeStream>
""")


@pytest.mark.parametrize("problem_type", [0, 1])
def test_freestream_preserved(problem_type):
    """A uniform stream through FC boundaries must stay exactly uniform
    (all flux differences vanish; the blending is an identity)."""
    deck = freestream_deck(problem_type=problem_type)
    case = build_case(deck)
    solver = Solver(case)
    S0 = np.asarray(solver.state.S).copy()
    diags = solver.run_iters(5)
    S1 = np.asarray(solver.state.S)
    np.testing.assert_allclose(S1, S0, rtol=1e-12, atol=1e-12)
    assert not np.asarray(diags["unstable"]).any()
    # uniform field -> zero residuals
    rms = np.asarray(diags["RMS"])
    assert rms.max() < 1e-12


def test_freestream_diagonal():
    deck = freestream_deck(u=300.0, v=200.0)
    case = build_case(deck)
    solver = Solver(case)
    S0 = np.asarray(solver.state.S).copy()
    solver.run_iters(3)
    np.testing.assert_allclose(np.asarray(solver.state.S), S0,
                               rtol=1e-12, atol=1e-12)


def test_dt_positive_and_lagged():
    deck = freestream_deck()
    case = build_case(deck)
    solver = Solver(case)
    d = solver.run_iters(3)
    dts = np.asarray(d["dt_used"])
    assert (dts > 0).all()
    # first iteration must use the initial Flow-list dt (one-iteration lag)
    assert dts[0] == pytest.approx(case.dt0)


def test_beta_bounded():
    deck = freestream_deck()
    case = build_case(deck)
    solver = Solver(case)
    solver.run_iters(3)
    beta = np.asarray(solver.state.beta)
    assert (beta <= 0.98 + 1e-12).all()
    assert (beta >= 0.0).all()


def test_obliqueshock_first_iterations_stable():
    from openhyperflow2d_tpu.config.deck import load_deck
    deck = load_deck(
        "/root/reference/OpenHyperFLOW2D/TestCases/ObliqueShock.dat")
    case = build_case(deck, serial_dt_mode=True)
    solver = Solver(case)
    d = solver.run_iters(20)
    assert not np.asarray(d["unstable"]).any()
    st = solver.host_state()
    # inflow Dirichlet preserved
    assert np.asarray(st.U)[0, 40] == pytest.approx(986.848)
    # deflected top stream preserved
    assert np.asarray(st.V)[160, 79] == pytest.approx(-172.297)
    # serial dt mode: monotone non-increasing dt
    dts = np.asarray(d["dt_used"])
    assert (np.diff(dts) <= 1e-18).all()
