"""Isolate the per-pair reduce cost: approx_max_k / segmented argmax /
top_k over [BP, Cmax] f32, with and without a gather-based producer."""

import sys
import os
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BP, Cmax, K = 131072, 1152, 1411
LO, HI, DEPTH = 1, 5, 3


def wall(fn, depth=DEPTH):
    outs = [fn() for _ in range(2)]
    _ = np.asarray(outs[-1]).ravel()[:1]
    t0 = time.perf_counter()
    outs = [fn() for _ in range(depth)]
    _ = np.asarray(outs[-1]).ravel()[:1]
    return (time.perf_counter() - t0) / depth


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    out = jnp.asarray(rng.normal(size=(BP, Cmax)).astype(np.float32))
    rns = jnp.asarray(rng.random((K, Cmax)).astype(np.float32))
    sorted_c = jnp.asarray(np.sort(rng.integers(0, K, BP)).astype(np.int32))
    caff = jnp.asarray(rng.normal(size=(BP,)).astype(np.float32))

    def measure(step, args, name):
        @partial(jax.jit, static_argnames=("L",))
        def loop(c, *arrays, L):
            def body(c, _):
                return step(c, *arrays), None
            c, _ = jax.lax.scan(body, c, None, length=L)
            return c
        res = {}
        for L in (LO, HI):
            res[L] = wall(lambda L=L: loop(jnp.float32(0), *args, L=L)) * 1e3
        per = (res[HI] - res[LO]) / (HI - LO)
        print(f"{name:44s} ~device {per:8.3f} ms", flush=True)

    def approx_plain(c, out):
        s, p = jax.lax.approx_max_k(out + c, 16, recall_target=0.98)
        return c + (jnp.sum(s) + jnp.sum(p.astype(jnp.float32))) * 1e-30
    measure(approx_plain, (out,), "approx16 on plain [BP,Cmax]")

    def approx_gather(c, out, rns, sorted_c, caff):
        scores = 2.0 * (out + c) - rns[sorted_c] + caff[:, None]
        s, p = jax.lax.approx_max_k(scores, 16, recall_target=0.98)
        return c + (jnp.sum(s) + jnp.sum(p.astype(jnp.float32))) * 1e-30
    measure(approx_gather, (out, rns, sorted_c, caff),
            "approx16 on gather-epilogue scores")

    def approx_barrier(c, out, rns, sorted_c, caff):
        scores = 2.0 * (out + c) - rns[sorted_c] + caff[:, None]
        scores = jax.lax.optimization_barrier(scores)
        s, p = jax.lax.approx_max_k(scores, 16, recall_target=0.98)
        return c + (jnp.sum(s) + jnp.sum(p.astype(jnp.float32))) * 1e-30
    measure(approx_barrier, (out, rns, sorted_c, caff),
            "approx16 on BARRIER(gather-epilogue)")

    def max_only(c, out):
        m = jnp.max(out + c, axis=1)
        a = jnp.argmax(out + c, axis=1)
        return c + (jnp.sum(m) + jnp.sum(a.astype(jnp.float32))) * 1e-30
    measure(max_only, (out,), "max+argmax (1 pass) [BP,Cmax]")

    def seg_top1(c, out):
        r = (out + c).reshape(BP, Cmax // 128, 128)
        m = jnp.max(r, axis=2)
        a = jnp.argmax(r, axis=2)
        return c + (jnp.sum(m) + jnp.sum(a.astype(jnp.float32))) * 1e-30
    measure(seg_top1, (out,), "seg128 top-1 (max+argmax) -> [BP,9]")

    def topk16(c, out):
        s, p = jax.lax.top_k(out + c, 16)
        return c + (jnp.sum(s) + jnp.sum(p.astype(jnp.float32))) * 1e-30
    measure(topk16, (out,), "lax.top_k(16) [BP,Cmax]")

    def sum_only(c, out):
        return c + jnp.sum(out) * 1e-30 + jnp.sum(c) * 0
    measure(sum_only, (out,), "sum (pure read)")


if __name__ == "__main__":
    main()
