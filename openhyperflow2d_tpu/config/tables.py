"""Piecewise-linear property tables.

Re-implements the reference ``Table::GetVal`` (obj_data/obj_data.cpp:1822-1859)
with identical branch semantics, plus a vectorized JAX version used inside the
solver step for temperature-dependent gas properties.

Exact reference semantics (deliberately preserved, including quirks):

* single-row tables return ``y[0]``;
* ``x <= x[0]``  -> linear extrapolation on the first segment (i = 1);
* ``x >= x[n-1]`` -> linear extrapolation on the last segment (i = n-1);
* otherwise the first ascending bracket ``x[i-1] <= x < x[i]`` wins.  Tables
  stored in descending order (several shipped decks do this, e.g. ``lam_OX``)
  therefore always resolve through the two boundary checks;
* the "zero table" singleton always returns 0 (obj_data.cpp:1678).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class Table:
    """Host-side (x, y) table with reference-exact interpolation."""

    x: np.ndarray
    y: np.ndarray
    name: str = ""
    is_zero: bool = field(default=False)

    @classmethod
    def zero(cls) -> "Table":
        return cls(np.zeros(1), np.zeros(1), name="ZeroTable", is_zero=True)

    @classmethod
    def constant(cls, value: float, name: str = "") -> "Table":
        return cls(np.zeros(1), np.asarray([value], dtype=np.float64),
                   name=name)

    @property
    def n(self) -> int:
        return int(self.x.shape[0])

    def get_val(self, q: float) -> float:
        """Scalar ``Table::GetVal`` (obj_data.cpp:1822-1859)."""
        if self.is_zero:
            return 0.0
        x, y, n = self.x, self.y, self.n
        if n == 1:
            return float(y[0])
        if q <= x[0]:
            i = 1
        elif q >= x[n - 1]:
            i = n - 1
        else:
            i = n - 1
            for k in range(1, n):
                if x[k - 1] <= q < x[k]:
                    i = k
                    break
        return float(y[i] + (y[i - 1] - y[i]) * (q - x[i]) / (x[i - 1] - x[i]))

    def __call__(self, q: float) -> float:
        return self.get_val(q)


def table_lookup(xs, ys, q, ascending: bool = False):
    """Vectorized JAX equivalent of ``Table::GetVal``.

    ``xs``/``ys`` are 1-D knot arrays (any jnp-compatible arrays), ``q`` is an
    arbitrary-shape query array.  Branch order matches the reference exactly:
    boundary checks win over the ascending bracket scan.

    Implemented as a masked sum over segments with statically-indexed knots:
    per-node gathers are extremely slow on the TPU scalar unit, while the
    n-1 (<= ~16) masked fma terms are pure VPU work that XLA fuses into the
    surrounding elementwise graph.

    ``ascending`` (a STATIC claim the caller must establish host-side, e.g.
    build_case's chem_asc scan) selects the telescoped slope-delta form

        f(q) = y0 + m1 (q - x0) + sum_s (m_s - m_{s-1}) relu(q - x_{s-1})

    which is an exact algebraic identity of the masked form when the knots
    are strictly ascending (same segment-1/segment-(n-1) linear
    extrapolation at both ends) at a third of the vector ops — the hot
    chemistry path evaluates 12 of these per cell per iteration.
    """
    import jax.numpy as jnp

    # tuple/list knots (scalars) are kept as-is — the Pallas kernel passes
    # SMEM scalar reads this way, avoiding rank-1 vectors that Mosaic's
    # layout inference cannot place
    if not isinstance(xs, (tuple, list)):
        xs = jnp.asarray(xs)
    if not isinstance(ys, (tuple, list)):
        ys = jnp.asarray(ys)
    q = jnp.asarray(q)
    n = len(xs) if isinstance(xs, (tuple, list)) else xs.shape[0]
    if n == 1:
        return jnp.broadcast_to(ys[0], q.shape).astype(q.dtype)

    if ascending:
        slopes = [(ys[s] - ys[s - 1]) / (xs[s] - xs[s - 1])
                  for s in range(1, n)]            # scalar-unit work
        out = ys[0] + slopes[0] * (q - xs[0])
        for s in range(2, n):
            out = out + ((slopes[s - 1] - slopes[s - 2])
                         * jnp.maximum(q - xs[s - 1], 0.0))
        return out

    lo = q <= xs[0]                 # -> segment 1
    hi = (~lo) & (q >= xs[n - 1])   # -> segment n-1
    mid = ~lo & ~hi

    # first ascending bracket (exclusive running-or), C++ scan order
    seen = jnp.zeros_like(lo)
    first = []
    for s in range(1, n):
        b = (q >= xs[s - 1]) & (q < xs[s])
        first.append(b & ~seen)
        seen = seen | b
    no_bracket = ~seen

    out = jnp.zeros_like(q)
    for s in range(1, n):
        sel = mid & first[s - 1]
        if s == 1:
            sel = sel | lo
        if s == n - 1:
            sel = sel | hi | (mid & no_bracket)
        seg = ys[s] + (ys[s - 1] - ys[s]) * (q - xs[s]) / (xs[s - 1] - xs[s])
        out = out + jnp.where(sel, seg, 0.0)
    return out


@dataclass
class DeviceTable:
    """Table knots staged as jnp arrays for in-graph lookup."""

    xs: object
    ys: object

    @classmethod
    def from_table(cls, t: Table, dtype=None) -> "DeviceTable":
        import jax.numpy as jnp
        dtype = dtype or jnp.float32
        if t.is_zero:
            return cls(jnp.zeros((1,), dtype), jnp.zeros((1,), dtype))
        return cls(jnp.asarray(t.x, dtype), jnp.asarray(t.y, dtype))

    def __call__(self, q):
        return table_lookup(self.xs, self.ys, q)
