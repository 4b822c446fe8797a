"""fast_math (reciprocal-multiply) and static-specialization consistency.

The fast_math flag rewrites repeated divisions as one reciprocal + multiplies
(last-ulp rounding changes only); the `models`/`has_walls` static narrowing
must be bit-exact (it only removes jnp.where branches whose masks are
provably all-false for the case).  Both are validated against the default
path on a short reacting RANS run.
"""

import dataclasses

import numpy as np
import pytest

from openhyperflow2d_tpu.examples import reacting_rans_deck
from openhyperflow2d_tpu.solver.init import build_case
from openhyperflow2d_tpu.solver.runner import Solver


def _run(fast_math, widen_models=False, n=25):
    case = build_case(reacting_rans_deck(48, 48), dtype="float64")
    params = dataclasses.replace(case.params, fast_math=fast_math)
    if widen_models:
        # un-narrowed params: all model branches compiled, walls on
        params = dataclasses.replace(
            params, models=("prandtl", "keps", "sa", "smag"),
            has_walls=True)
    case.params = params
    s = Solver(case)
    s.run_iters(n)
    return s.host_state()


def test_static_specialization_is_bit_exact():
    a = _run(False)
    b = _run(False, widen_models=True)
    for f in ("S", "U", "V", "p", "Tg", "mu_t", "beta"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), err_msg=f)


def test_fast_math_matches_to_roundoff():
    # short horizon: pure last-ulp differences (measured ~1e-16 at 5 iters);
    # long horizon: the scheme's own chaotic amplification bounds agreement
    # (see VALIDATION.md) — assert the envelope stays small
    a5, b5 = _run(False, n=5), _run(True, n=5)
    a, b = _run(False), _run(True)
    for f in ("S", "U", "V", "p", "Tg"):
        x5 = np.asarray(getattr(a5, f))
        y5 = np.asarray(getattr(b5, f))
        scale5 = np.abs(x5).max() + 1e-300
        assert np.max(np.abs(x5 - y5)) / scale5 < 1e-13, f
        x = np.asarray(getattr(a, f))
        y = np.asarray(getattr(b, f))
        scale = np.abs(x).max() + 1e-300
        assert np.max(np.abs(x - y)) / scale < 1e-5, f
