"""Deck parser tests against hand values and the shipped TestCases."""

import os

import numpy as np
import pytest

from openhyperflow2d_tpu.config.deck import (Deck, DeckError, atoi, load_deck,
                                             parse_deck, strtod)

TESTCASES = "/root/reference/OpenHyperFLOW2D/TestCases"

SIMPLE = """
; a comment
<start/UnitTest>
<data/MaxX=320>  ; trailing comment
<data/dx=0.01303125>
<data/Name=hello world>
<data/Cond=NT_D0Y_2D, CT_V_CONST_2D>
<table=tbl/3>
0       0.1
100     0.5
200.    1.0
<endtable>
<end/UnitTest>
"""


def test_scalar_directives():
    d = parse_deck(SIMPLE)
    assert d.name == "UnitTest"
    assert d.get_int("MaxX") == 320
    assert d.get_float("dx") == pytest.approx(0.01303125)
    assert d.get_str("Name") == "hello world"
    assert d.get_str("Cond") == "NT_D0Y_2D, CT_V_CONST_2D"


def test_table_directive():
    d = parse_deck(SIMPLE)
    t = d.get_table("tbl")
    assert t.n == 3
    np.testing.assert_allclose(t.x, [0.0, 100.0, 200.0])
    assert t.get_val(50.0) == pytest.approx(0.3)


def test_missing_key_error_flag():
    d = parse_deck(SIMPLE)
    with pytest.raises(DeckError):
        d.get_int("nope")
    assert d.error == -1
    assert d.get_int("nope", default=7, required=False) == 7
    assert d.get_int("MaxX") == 320
    assert d.error == 0


def test_lenient_c_number_parsing():
    # atof/strtod semantics: longest valid numeric prefix.
    assert strtod("3338.0.") == pytest.approx(3338.0)
    assert strtod("-0.1735.3e7") == pytest.approx(-0.1735)
    assert strtod("1.5e3x") == pytest.approx(1500.0)
    assert strtod("junk") == 0.0
    assert atoi("12abc") == 12
    assert atoi("x") == 0


@pytest.mark.parametrize("case", ["ObliqueShock", "Step", "Wedge",
                                  "TriplePoint"])
def test_shipped_decks_parse(case):
    deck = load_deck(os.path.join(TESTCASES, case + ".dat"))
    assert deck.get_int("MaxX") > 0
    assert deck.get_int("MaxY") > 0
    assert deck.get_float("dx") > 0
    assert deck.get_float("CFL") > 0
    assert deck.get_table("CFL_Scenario") is not None
    assert deck.get_table("beta_Scenario") is not None
    # property tables for all four species
    for sp in ("Fuel", "OX", "cp", "air"):
        for prop in ("lam", "mu", "Cp"):
            assert deck.get_table(f"{prop}_{sp}") is not None


def test_obliqueshock_known_values():
    deck = load_deck(os.path.join(TESTCASES, "ObliqueShock.dat"))
    assert deck.get_int("MaxX") == 320
    assert deck.get_int("MaxY") == 80
    assert deck.get_float("dx") == pytest.approx(0.01303125)
    assert deck.get_float("dy") == pytest.approx(0.0125)
    assert deck.get_int("BFF") == 4
    assert deck.get_float("beta") == pytest.approx(0.9895)
    assert deck.get_int("MonitorIndex") == 5
    assert deck.get_int("Nmax") == 12000
    assert deck.get_int("NumFlow2D") == 2
    assert deck.get_float("Flow2D-2.U") == pytest.approx(891.342)
    assert deck.get_float("Flow2D-2.V") == pytest.approx(-172.297)
    assert deck.get_str("Contour1.Bound3.Cond") == "NT_D0Y_2D, CT_V_CONST_2D"
    beta_t = deck.get_table("beta_Scenario")
    assert beta_t.get_val(0) == pytest.approx(0.9875)
    assert beta_t.get_val(100000) == pytest.approx(0.9895)
    # beyond the last knot the reference extrapolates linearly
    # (the solver caps the result with min(beta0, scenario))
    assert beta_t.get_val(200000) == pytest.approx(0.99075)
