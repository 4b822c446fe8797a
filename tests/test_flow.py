"""Gas-dynamics (Flow/Flow2D) tests vs closed-form values."""

import math

import pytest

from openhyperflow2d_tpu.gasdyn.flow import FV_MACH, FV_VELOCITY, Flow, Flow2D


def test_default_flow_state():
    f = Flow()
    assert f.kg() == pytest.approx(1.4)
    assert f.T0() == 300.0
    assert f.P0() == 1.e5
    assert f.Rg() == 300.0
    assert f.C == pytest.approx(1.4 * 300.0 / 0.4)


def test_gas_dynamic_functions_closed_form():
    f = Flow(Cp=1004.5, T0=400.0, P0=2.e5, R=287.0)
    k = f.kg()
    lam = 1.2
    f.LAM(lam)
    tau = 1 - (k - 1) / (k + 1) * lam * lam
    assert f.TAU() == pytest.approx(tau)
    assert f.PF() == pytest.approx(tau ** (k / (k - 1)))
    assert f.EPS() == pytest.approx(tau ** (1 / (k - 1)))
    q = ((k + 1) / 2) ** (1 / (k - 1)) * lam * tau ** (1 / (k - 1))
    assert f.QF() == pytest.approx(q)
    assert f.ZF() == pytest.approx(lam + 1 / lam)


def test_akr_asound_mach():
    f = Flow(Cp=1004.5, T0=400.0, P0=2.e5, R=287.0)
    k = f.kg()
    assert f.Akr() == pytest.approx(math.sqrt(2 * k / (k + 1) * 287.0 * 400.0))
    f.MACH(2.0)
    # lambda(M) closed form
    lam = math.sqrt((k + 1) / 2 * 4 / (1 + (k - 1) / 2 * 4))
    assert f.LAM() == pytest.approx(lam)
    assert f.MACH() == pytest.approx(2.0, rel=1e-12)
    # Wg = lam * Akr and Asound = sqrt(kRT0 tau)
    assert f.Wg() == pytest.approx(lam * f.Akr())
    assert f.Wg() / f.Asound() == pytest.approx(2.0)


def test_bisection_inversion_tolerance():
    f = Flow(Cp=1004.5, T0=400.0, P0=2.e5, R=287.0)
    f.LAM(1.3)
    tau = f.TAU()
    g = Flow(Cp=1004.5, T0=400.0, P0=2.e5, R=287.0)
    g.TAU(tau)
    # reference bisection: 1% tolerance on the function value
    assert g.TAU() == pytest.approx(tau, rel=0.011)


def test_wg_setter_bounds():
    f = Flow()
    assert f.Wg(-1.0) == -1.0
    assert f.Wg(f.Akr() * f.lam_max() * 1.01) == -1.0
    w = 200.0
    assert f.Wg(w) == w
    assert f.Wg() == pytest.approx(w)


def test_correct_flow_velocity_fixed_point():
    # After CorrectFlow(T, p, W, FV_VELOCITY): static T, p at velocity W.
    f = Flow2D(mu=5e-5, lam=0.03, Cp=1004.5, T=288.15, P=101325.0, R=287.05,
               u=986.848, v=0.0)
    W = math.sqrt(986.848 ** 2 + 1.e-30)
    f.correct_flow(288.15, 101325.0, W, FV_VELOCITY)
    assert f.Tg() == pytest.approx(288.15, rel=2e-3)
    assert f.Pg() == pytest.approx(101325.0, rel=2e-3)
    assert Flow.Wg(f) == pytest.approx(W, rel=1e-6)


def test_correct_flow_mach_fixed_point():
    f = Flow2D(mu=5e-5, lam=0.03, Cp=1004.5, T=300.0, P=1.e5, R=287.05,
               u=0.0, v=0.0)
    f.correct_flow(300.0, 1.e5, 2.5, FV_MACH)
    assert f.MACH() == pytest.approx(2.5, rel=1e-3)
    assert f.Tg() == pytest.approx(300.0, rel=2e-3)
    assert f.Pg() == pytest.approx(1.e5, rel=2e-3)


def test_flow2d_velocity_components():
    f = Flow2D(mu=5e-5, lam=0.03, Cp=1004.5, T=362.648, P=216782.0, R=287.05,
               u=891.342, v=-172.297)
    assert f.U() == pytest.approx(891.342)
    assert f.V() == pytest.approx(-172.297)
    w = math.sqrt(891.342 ** 2 + 172.297 ** 2 + 1e-5)
    assert f.Wg() == pytest.approx(w)


def test_flow2d_mach_preserves_angle():
    f = Flow2D(mu=5e-5, lam=0.03, Cp=1004.5, T=300.0, P=1.e5, R=287.05,
               u=100.0, v=-50.0)
    angle = math.atan(f.V() / f.U())
    f.MACH(1.5)
    assert math.atan(f.V() / f.U()) == pytest.approx(angle, rel=1e-12)


def test_rog_matches_static_density():
    # ROG() = EPS * p0/(R T0) must equal Pg/(R Tg) on an isentrope.
    f = Flow(Cp=1004.5, T0=400.0, P0=2.e5, R=287.0)
    f.LAM(0.9)
    assert f.ROG() == pytest.approx(f.Pg() / (287.0 * f.Tg()), rel=1e-12)
