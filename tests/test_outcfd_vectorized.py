"""Vectorized output-path sweeps match the reference's interpreted-order
loops exactly (SmoothX/SmoothY out_cfd_param.cpp:500-522; the heat-flux
column/row accumulators 648-679 / 705-757)."""

import numpy as np

from openhyperflow2d_tpu.postproc.outcfd import (_fold_max_nonzero,
                                                 _last_wall_value, smooth_x,
                                                 smooth_y)


def _smooth_x_loop(a):
    X, Y = a.shape
    for j in range(Y):
        for i in range(1, X - 1):
            if a[i + 1, j] > 0.0 and a[i - 1, j] > 0.0:
                a[i, j] = 0.5 * (a[i + 1, j] + a[i - 1, j])
    return a


def _smooth_y_loop(a):
    X, Y = a.shape
    for j in range(1, Y - 1):
        for i in range(X):
            if a[i, j + 1] > 0.0 and a[i, j - 1] > 0.0:
                a[i, j] = 0.5 * (a[i, j + 1] + a[i, j - 1])
    return a


def test_smooth_xy_match_loop_order():
    rng = np.random.default_rng(7)
    # mixed-sign values so the >0 gates toggle mid-sweep
    a0 = rng.normal(size=(37, 23))
    a0[rng.random(a0.shape) < 0.3] = 0.0
    np.testing.assert_array_equal(smooth_x(a0.copy()),
                                  _smooth_x_loop(a0.copy()))
    np.testing.assert_array_equal(smooth_y(a0.copy()),
                                  _smooth_y_loop(a0.copy()))
    # composed, as the viewers apply them
    np.testing.assert_array_equal(
        smooth_y(smooth_x(a0.copy())),
        _smooth_y_loop(_smooth_x_loop(a0.copy())))


def test_heatflux_fold_matches_reference_accumulator():
    """Column fold: heat = q if heat==0 else max(heat, q), j ascending —
    incl. the quirk that a running value of exactly 0 is overwritten."""
    rng = np.random.default_rng(3)
    X, Y = 29, 17
    q = rng.normal(size=(X, Y))
    q[rng.random((X, Y)) < 0.2] = 0.0
    sel = rng.random((X, Y)) < 0.4

    expect = np.zeros(X)
    for i in range(X):
        for j in range(Y):
            if sel[i, j]:
                if expect[i] != 0.0:
                    expect[i] = max(expect[i], q[i, j])
                else:
                    expect[i] = q[i, j]

    heat = np.zeros(X)
    for j in range(Y):
        heat = _fold_max_nonzero(heat, sel[:, j], q[:, j])
    np.testing.assert_array_equal(heat, expect)


def test_last_wall_value_matches_loop():
    rng = np.random.default_rng(11)
    X, Y = 19, 13
    vals = rng.normal(size=(X, Y))
    sel = rng.random((X, Y)) < 0.3
    sel[4, :] = False           # a column with no wall nodes -> 0
    expect = np.zeros(X)
    for i in range(X):
        for j in range(Y):
            if sel[i, j]:
                expect[i] = vals[i, j]
    np.testing.assert_array_equal(_last_wall_value(vals, sel), expect)
