"""Production-config regression gate (VERDICT-r4 item 6).

The shipped fused-path default — K=8, 128x384 tiles (round-5 sweep
optimum), persistent strip
staging, ctx streaming, fast_math, float32 — previously had its
correctness measured only by a script artifact (scripts/k8_correctness.py
+ PERF.md numbers); a regression in the default config would never fail a
test.  This gate runs the EXACT production configuration in interpret
mode on CPU at a reduced grid sized so every machinery branch of the
4096^2 bench shape is exercised (nbx >= 2 -> X strips, nby >= 2 -> HY=64
Y strips, K=8 -> rolled fori_loop + remainder block) and asserts the
documented dt-lag envelope against the reference-exact XLA path from a
settled state — the same methodology as the TPU script (which remains
the hardware artifact).
"""

import dataclasses

import numpy as np
import pytest

from openhyperflow2d_tpu.examples import reacting_rans_deck
from openhyperflow2d_tpu.solver.init import build_case
from openhyperflow2d_tpu.solver.runner import Solver


def _mk(walls=False):
    # 512x512 at cfl=0.05 — measured stable through 90 iterations on the
    # CPU path (the bench deck's impulsive ignition is Tg<0-marginal at
    # cfl>=0.1 on this platform); tile (128, 384) -> nbx=4 (X halo
    # strips), nby=2 (HY=64 Y strips — the branch a full-Y tile skips)
    deck = reacting_rans_deck(512, 512, cfl=0.05, wall_bottom=walls,
                              adiabatic=not walls, with_step=walls)
    case = build_case(deck, dtype="float32")
    case.params = dataclasses.replace(case.params, fast_math=True)
    return case


@pytest.mark.slow
@pytest.mark.parametrize("walls", [False, True],
                         ids=["open", "walls+heat"])
def test_k8_production_config_envelope(walls, monkeypatch):
    """Shipped default (K=8, 128x384, persistent, ctx-stream) vs the XLA
    path over one K-block from a settled state: the K-frozen dt lag is
    the only semantic difference, so fields must stay within the
    documented envelope (PERF.md: <= 2% settled)."""
    import jax
    import jax.numpy as jnp
    monkeypatch.setenv("HF2D_PERSIST", "1")
    monkeypatch.setenv("HF2D_CTXSTREAM", "1")

    settle, iters = 81, 9          # 9-1 = one whole K=8 block
    ref = Solver(_mk(walls))
    ref.run_iters(settle)
    pal = Solver(_mk(walls), use_pallas=True, pallas_tile=(128, 384),
                 pallas_fuse=8)
    pal.state = jax.tree.map(jnp.copy, ref.state)   # chunk donates inputs
    pal.last_iter = ref.last_iter

    dp = pal.run_iters(iters)
    ref2 = Solver(_mk(walls))
    ref2.state = ref.state
    ref2.last_iter = settle
    dr = ref2.run_iters(iters)

    assert not np.asarray(dp["unstable"]).any()
    assert not np.asarray(dr["unstable"]).any()
    devs = {}
    for f in ["S", "U", "V", "p", "Tg", "mu_t"]:
        a = np.asarray(getattr(ref2.state, f))
        b = np.asarray(getattr(pal.state, f))
        devs[f] = float(np.abs(a - b).max() / (np.abs(a).max() + 1e-30))
    dt_rel = float(np.abs(np.asarray(dp["dt_used"])[-1]
                          - np.asarray(dr["dt_used"])[-1])
                   / np.asarray(dr["dt_used"])[-1])
    # measured envelope at this config: <= 1.9% fields, <1% dt (2x
    # headroom); a machinery regression (staging, ctx stream, halo, K
    # rotation) lands far outside it
    assert max(devs.values()) < 4e-2, devs
    assert dt_rel < 2e-2, dt_rel
