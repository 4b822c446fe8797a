"""Measure achievable VPU element-op throughput on this chip.

Anchors the kernel's compute-bound analysis: a long fused elementwise
chain (fma / select / div / sqrt mixes) on a large f32 array, timed over
many dispatches.  The resulting elem-ops/s is the realistic ceiling for
the solver kernel's per-cell op budget.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = 4096
    x = jnp.ones((n, n), jnp.float32) * 1.0000001
    reps = 20

    def bench(name, f, ops_per_iter, iters):
        g = jax.jit(f)
        y = g(x)
        jax.block_until_ready(y)
        t0 = time.time()
        for _ in range(reps):
            y = g(y)
        jax.block_until_ready(y)
        dt = (time.time() - t0) / reps
        tput = n * n * ops_per_iter * iters / dt
        print(json.dumps({"what": name, "sec": dt,
                          "elem_ops_per_sec": f"{tput:.3e}"}), flush=True)

    K = 200

    def fma_chain(a):
        for _ in range(K):
            a = a * 1.0000001 + 1e-7
        return a
    bench(f"fma chain x{K} (2 ops each)", fma_chain, 2, K)

    def sel_chain(a):
        for _ in range(K):
            a = jnp.where(a > 1.0, a * 1.0000001, a + 1e-7)
        return a
    bench(f"cmp+select+mul chain x{K} (3 ops)", sel_chain, 3, K)

    def div_chain(a):
        for _ in range(K // 4):
            a = a / (a + 1.0) + 1.000001
        return a
    bench(f"div+2add chain x{K//4} (3 ops)", div_chain, 3, K // 4)

    def sqrt_chain(a):
        for _ in range(K // 4):
            a = jnp.sqrt(a + 1.0) + 1.0
        return a
    bench(f"sqrt+2add chain x{K//4} (3 ops)", sqrt_chain, 3, K // 4)


if __name__ == "__main__":
    main()
