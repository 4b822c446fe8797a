"""VPU rates for division-class ops: div, exact/approx reciprocal, sqrt,
rsqrt — sizes the prize of an approx-reciprocal pass over the solver's
~30 division-planes/iteration (PERF.md round-4).

Same methodology as vpu_peak.py: a dependent chain inside one Pallas
kernel, timed over many calls, D2H-forced (block_until_ready through the
tunnel is not a completion barrier).

Run: python scripts/vpu_div_peak.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_CHAIN = 96
SHAPE = (256, 512)


def make_kernel(op):
    def kernel(x_ref, o_ref):
        q = x_ref[...]
        for _ in range(N_CHAIN):
            q = op(q)
        o_ref[...] = q

    return jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
        interpret=(jax.default_backend() == "cpu")))


OPS = {
    # every op keeps values in a stable range so the chain neither
    # under- nor overflows across 96 applications
    "mul-add (baseline)": lambda q: q * 1.000001 + 1e-7,
    "div": lambda q: 2.0 / q,
    "reciprocal exact": lambda q: pl.reciprocal(q, approx=False) * 2.0,
    "reciprocal approx": lambda q: pl.reciprocal(q, approx=True) * 2.0,
    "sqrt": lambda q: jnp.sqrt(q) + 1.0,
    "rsqrt": lambda q: jax.lax.rsqrt(q) + 1.0,
}


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
    x = jnp.asarray(1.0 + np.random.default_rng(0).random(
        SHAPE, np.float32))
    elems = SHAPE[0] * SHAPE[1] * N_CHAIN
    base = None
    for name, op in OPS.items():
        try:
            f = make_kernel(op)
            np.asarray(f(x))
            reps = 50
            t0 = time.time()
            for _ in range(reps):
                y = f(x)
            np.asarray(y)
            dt = (time.time() - t0) / reps
            rate = elems / dt / 1e12
            if base is None:
                base = dt
            print(f"{name:<22} {dt * 1e3:7.3f} ms  {rate:6.2f} Telem/s  "
                  f"x{dt / base:.2f} vs baseline")
        except Exception as e:   # noqa: BLE001
            print(f"{name:<22} FAILED: {str(e)[:120]}")


if __name__ == "__main__":
    main()
