"""MXU-vs-VPU stencil experiment (VERDICT-r4 item 7).

The fused kernel is VPU-bound while the MXU sits idle.  The only way to
move stencil work onto the MXU is to express neighbor combinations as
matmuls against (banded) shift/averaging matrices — the MXU cannot
exploit the band, so each output element costs W MACs (W = contraction
width) instead of the ~3 VPU ops of the shift-add form.  v5e peak ratios
(MXU bf16 ~197 TF/s, ~f32 ~49 TF/s vs the measured 2.6e12 elem-ops/s VPU
rate) predict the matmul form is 3-15x slower; this script measures it.

Benchmarked op: the pass-1 blend term over 9 equation planes on a
bench-shaped tile window, Y direction:
    out[p, x, y] = 0.5 * (q[p, x, y-1] + q[p, x, y+1])
(a) VPU: concat-shift + add + mul               (the kernel's form)
(b) MXU f32: q @ M, M[y', y] = 0.5*(|y'-y|==1)  (banded averaging matrix)
(c) MXU bf16 (f32 accumulation) — the MXU's best case

Usage (TPU): python scripts/mxu_stencil_bench.py [--reps 200]
Prints one JSON line with sustained times; 'verdict' pays/dead.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--planes", type=int, default=9)
    ap.add_argument("--wx", type=int, default=160)    # 128 + 2*16 halo
    ap.add_argument("--wy", type=int, default=384)    # 256 + 2*64 halo
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))

    P, WX, WY = args.planes, args.wx, args.wy
    key = jax.random.PRNGKey(0)
    q = jax.random.uniform(key, (P, WX, WY), jnp.float32)

    # banded averaging matrix (Y-neighbor mean)
    M = np.zeros((WY, WY), np.float32)
    for y in range(WY):
        if y > 0:
            M[y - 1, y] = 0.5
        if y < WY - 1:
            M[y + 1, y] = 0.5
    Mf = jnp.asarray(M)
    Mb = Mf.astype(jnp.bfloat16)

    def vpu(q):
        up = jnp.concatenate([q[..., :, 1:], q[..., :, -1:]], axis=-1)
        dn = jnp.concatenate([q[..., :, :1], q[..., :, :-1]], axis=-1)
        return (up + dn) * 0.5

    def mxu_f32(q):
        return jnp.einsum("pxw,wy->pxy", q, Mf,
                          preferred_element_type=jnp.float32)

    def mxu_bf16(q):
        return jnp.einsum("pxw,wy->pxy", q.astype(jnp.bfloat16), Mb,
                          preferred_element_type=jnp.float32)

    def chain(fn):
        # rep-times dependent applications in ONE jitted call so the
        # per-dispatch tunnel overhead (~50 ms) amortizes away
        def run(q):
            def body(i, acc):
                return fn(acc) * 0.999  # keep values bounded
            return jax.lax.fori_loop(0, args.reps, body, q)
        return jax.jit(run)

    results = {}
    for name, fn in [("vpu_shift", vpu), ("mxu_f32", mxu_f32),
                     ("mxu_bf16", mxu_bf16)]:
        f = chain(fn)
        out = f(q)
        np.asarray(out)             # true completion barrier (PERF.md)
        t0 = time.time()
        out = f(q)
        np.asarray(out)
        dt = time.time() - t0
        results[name] = dt / args.reps
    cells = P * WX * WY
    result = {
        "experiment": "mxu stencil (Y-neighbor mean, bench tile window)",
        "shape": [P, WX, WY], "reps": args.reps,
        "s_per_apply": {k: round(v, 8) for k, v in results.items()},
        "elem_per_s_vpu": round(cells * 3 / results["vpu_shift"] / 1e9, 2),
        "mxu_f32_slowdown": round(results["mxu_f32"]
                                  / results["vpu_shift"], 2),
        "mxu_bf16_slowdown": round(results["mxu_bf16"]
                                   / results["vpu_shift"], 2),
        "verdict": ("pays" if min(results["mxu_f32"], results["mxu_bf16"])
                    < results["vpu_shift"] else "dead"),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
