"""Table interpolation tests: scalar vs reference semantics, jnp vs scalar."""

import numpy as np
import pytest

from openhyperflow2d_tpu.config.tables import Table, table_lookup


def test_single_row():
    t = Table(np.array([0.0]), np.array([42.0]))
    assert t.get_val(-5) == 42.0
    assert t.get_val(1e9) == 42.0


def test_interior_interpolation():
    t = Table(np.array([0.0, 1.0, 3.0]), np.array([0.0, 10.0, 30.0]))
    assert t.get_val(0.5) == pytest.approx(5.0)
    assert t.get_val(2.0) == pytest.approx(20.0)


def test_linear_extrapolation_below_and_above():
    # Reference extrapolates linearly on end segments (obj_data.cpp:1834-1843)
    t = Table(np.array([1.0, 2.0, 4.0]), np.array([10.0, 20.0, 10.0]))
    assert t.get_val(0.0) == pytest.approx(0.0)     # first segment slope 10
    assert t.get_val(6.0) == pytest.approx(0.0)     # last segment slope -5
    assert t.get_val(1.0) == pytest.approx(10.0)
    assert t.get_val(4.0) == pytest.approx(10.0)


def test_descending_table_resolves_via_boundary_checks():
    # Shipped decks store e.g. lam_OX in descending-x order; the reference
    # then always resolves through the boundary checks.
    t = Table(np.array([1722.4, 1518.3, 1054.8]),
              np.array([0.11499, 0.10369, 0.076167]))
    # q < x[0] -> i=1 (first segment)
    expect = 0.10369 + (0.11499 - 0.10369) * (300.0 - 1518.3) / (1722.4
                                                                 - 1518.3)
    assert t.get_val(300.0) == pytest.approx(expect)
    # q above x[0] -> the >= x[n-1] check fires -> last segment
    expect_hi = 0.076167 + (0.10369 - 0.076167) * (2000.0 - 1054.8) / (
        1518.3 - 1054.8)
    assert t.get_val(2000.0) == pytest.approx(expect_hi)


def test_zero_table():
    assert Table.zero().get_val(123.0) == 0.0


@pytest.mark.parametrize("xs,ys", [
    (np.array([0.0, 1.0, 3.0, 7.0]), np.array([1.0, -2.0, 5.0, 5.5])),
    (np.array([1722.4, 1518.3, 1054.8, 812.42]),
     np.array([0.11499, 0.10369, 0.076167, 0.060663])),
])
def test_jnp_lookup_matches_scalar(xs, ys):
    t = Table(xs, ys)
    qs = np.linspace(xs.min() - 100.0, xs.max() + 100.0, 57)
    got = np.asarray(table_lookup(xs, ys, qs))
    want = np.array([t.get_val(q) for q in qs])
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_jnp_lookup_shapes():
    xs = np.array([0.0, 1.0, 2.0])
    ys = np.array([0.0, 1.0, 4.0])
    q = np.ones((4, 5)) * 1.5
    out = np.asarray(table_lookup(xs, ys, q))
    assert out.shape == (4, 5)
    np.testing.assert_allclose(out, 2.5)


def test_table_lookup_ascending_fast_path():
    """The telescoped slope-delta form is an exact identity of the masked
    form for strictly ascending knots (incl. linear extrapolation ends)."""
    import numpy as np
    from openhyperflow2d_tpu.config.tables import table_lookup
    rng = np.random.default_rng(0)
    xs = np.sort(rng.uniform(0, 100, 7))
    xs += np.arange(7) * 1e-3          # strictly ascending
    ys = rng.uniform(-5, 5, 7)
    q = rng.uniform(-50, 150, (64,))
    a = np.asarray(table_lookup(xs, ys, q))
    b = np.asarray(table_lookup(xs, ys, q, ascending=True))
    np.testing.assert_allclose(b, a, rtol=5e-6, atol=1e-6)
    # 2-knot table (the shipped-deck common case)
    a = np.asarray(table_lookup(xs[:2], ys[:2], q))
    b = np.asarray(table_lookup(xs[:2], ys[:2], q, ascending=True))
    np.testing.assert_allclose(b, a, rtol=5e-6, atol=1e-6)
