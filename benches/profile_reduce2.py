"""Second round: find a fast top-n_sur structure.

(a) approx_max_k row-count sensitivity: [B, P*Cmax] per-query rows
(b) seg-top-2 first stage cost incl. regroup gather
(c) second-stage candidates: top-40 over [B, 576]
"""

import sys
import os
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, P, Cmax, K = 16384, 8, 1152, 1411
BP = B * P
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
    inv = jnp.asarray(rng.permutation(BP).astype(np.int32))

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
        print(f"{name:52s} ~device {per:8.3f} ms", flush=True)

    def approx_query_rows(c, out, inv):
        rows = (out + c)[inv].reshape(B, P * Cmax)
        s, p = jax.lax.approx_max_k(rows, 40, recall_target=0.98)
        return c + (jnp.sum(s) + jnp.sum(p.astype(jnp.float32))) * 1e-30
    measure(approx_query_rows, (out, inv),
            f"regroup + approx40 [B={B}, {P*Cmax}]")

    W = 32
    S = Cmax // W

    def seg_top2_pair(c, out, inv):
        r = (out + c).reshape(BP, S, W)
        m1 = jnp.max(r, axis=2)
        a1 = jnp.argmax(r, axis=2).astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, r.shape, 2)
        r2 = jnp.where(lane == a1[:, :, None], -jnp.inf, r)
        m2 = jnp.max(r2, axis=2)
        a2 = jnp.argmax(r2, axis=2).astype(jnp.int32)
        return c + (jnp.sum(m1) + jnp.sum(m2) +
                    jnp.sum((a1 + a2).astype(jnp.float32))) * 1e-30
    measure(seg_top2_pair, (out, inv), f"seg{W} top-2 per pair [BP,{S}]x2")

    def seg_top2_query(c, out, inv):
        rows = (out + c)[inv].reshape(B, P * S, W)
        m1 = jnp.max(rows, axis=2)
        a1 = jnp.argmax(rows, axis=2).astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 2)
        r2 = jnp.where(lane == a1[:, :, None], -jnp.inf, rows)
        m2 = jnp.max(r2, axis=2)
        a2 = jnp.argmax(r2, axis=2).astype(jnp.int32)
        return c + (jnp.sum(m1) + jnp.sum(m2) +
                    jnp.sum((a1 + a2).astype(jnp.float32))) * 1e-30
    measure(seg_top2_query, (out, inv),
            f"regroup + seg{W} top-2 per query [B,{P*S}]x2")

    cand = jnp.asarray(rng.normal(size=(B, 2 * P * S)).astype(np.float32))

    def topk40(c, cand):
        s, p = jax.lax.top_k(cand + c, 40)
        return c + (jnp.sum(s) + jnp.sum(p.astype(jnp.float32))) * 1e-30
    measure(topk40, (cand,), f"lax.top_k(40) [B, {2*P*S}]")

    def approx40(c, cand):
        s, p = jax.lax.approx_max_k(cand + c, 40, recall_target=0.98)
        return c + (jnp.sum(s) + jnp.sum(p.astype(jnp.float32))) * 1e-30
    measure(approx40, (cand,), f"approx_max_k(40) [B, {2*P*S}]")

    def sort_full(c, cand):
        s = jnp.sort(cand + c, axis=1)
        return c + jnp.sum(s[:, :40]) * 1e-30
    measure(sort_full, (cand,), f"full sort [B, {2*P*S}]")


if __name__ == "__main__":
    main()
