"""Microbenchmark: stencil-shift implementations inside a Pallas kernel.

Measures a chain of dependent shift+add ops on a VMEM-resident block,
comparing the solver's concat-of-slices edge-replicated shift against a
wraparound roll (lane/sublane rotate) in both X (sublane) and Y (lane)
dims.  If Mosaic already lowers concat(slice, slice) to a rotate, the
two should time identically; if not, the roll form bounds the win
available to the fused solver kernel (~27% of its op stream is
slice+concat, scripts/count_ops.py --dce).

Run on the TPU:  python scripts/shift_microbench.py
"""

import functools
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

N_CHAIN = 64
SHAPE = (256, 512)


def shift_concat_x(q):
    return jnp.concatenate([q[..., :1, :], q[..., :-1, :]], axis=-2)


def shift_roll_x(q):
    return jnp.roll(q, 1, axis=-2)


def shift_concat_y(q):
    return jnp.concatenate([q[..., :, :1], q[..., :, :-1]], axis=-1)


def shift_roll_y(q):
    return jnp.roll(q, 1, axis=-1)


def make_kernel(shift):
    def kernel(x_ref, o_ref):
        q = x_ref[...]
        acc = q
        for _ in range(N_CHAIN):
            q = shift(q)
            acc = acc + q
        o_ref[...] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
        interpret=(jax.default_backend() == "cpu"))


def bench(name, shift, x):
    f = jax.jit(make_kernel(shift))
    y = f(x)
    np.asarray(y)                     # force through the tunnel
    t0 = time.time()
    reps = 100
    for _ in range(reps):
        y = f(x)
    np.asarray(y)
    dt = (time.time() - t0) / reps
    per_shift = dt / N_CHAIN * 1e6
    print(f"{name:<16} {dt * 1e3:8.3f} ms/call  {per_shift:8.3f} us/shift+add")
    return dt


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
    x = jnp.asarray(np.random.default_rng(0).random(SHAPE, np.float32))
    results = {}
    for name, s in [("concat-x", shift_concat_x), ("roll-x", shift_roll_x),
                    ("concat-y", shift_concat_y), ("roll-y", shift_roll_y)]:
        results[name] = bench(name, s, x)
    print(f"roll-x/concat-x: {results['roll-x'] / results['concat-x']:.3f}  "
          f"roll-y/concat-y: {results['roll-y'] / results['concat-y']:.3f}")


if __name__ == "__main__":
    main()
