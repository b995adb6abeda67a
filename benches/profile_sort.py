"""Device cost of the pair-grouping primitives at mega-batch scale
(B=16384, P=8 -> BP=131072): argsort, sort_key_val+scatter-inverse, and the
fused einsum + segment-top2 epilogue vs materialized scores."""

import sys
import os
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LO, HI, DEPTH = 1, 9, 4


def wall(fn, depth=DEPTH):
    outs = [fn() for _ in range(2)]
    _ = np.asarray(outs[-1]).ravel()[:1]
    t0 = time.perf_counter()
    outs = [fn() for _ in range(depth)]
    _ = np.asarray(outs[-1]).ravel()[:1]
    return (time.perf_counter() - t0) / depth


def device_ms(step, args, name):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("L",))
    def loop(c, *arrays, L):
        def body(c, _):
            return step(c, *arrays), None
        c, _ = jax.lax.scan(body, c, None, length=L)
        return c

    init = jnp.float32(0)
    results = {}
    for L in (LO, HI):
        results[L] = wall(lambda L=L: loop(init, *args, L=L)) * 1e3
    dev = (results[HI] - results[LO]) / (HI - LO)
    print(f"{name:52s} device {dev:8.3f} ms   (wall L1 {results[LO]:7.2f})",
          flush=True)
    return dev


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B, P, K, Cmax, D = 16384, 8, 4300, 320, 128
    q_cap = 128
    BP = B * P

    flat_c_np = rng.integers(0, K, BP).astype(np.int32)
    flat_c = jnp.asarray(flat_c_np)

    def argsort2_step(c, flat_c):
        f = flat_c ^ jnp.int32(0)  # no-op dep; c folds in below
        order = jnp.argsort(f + (c * 0).astype(jnp.int32))
        inv = jnp.argsort(order)
        return c + (order.sum() + inv.sum()).astype(jnp.float32) * 1e-30
    device_ms(argsort2_step, (flat_c,), f"argsort x2 over BP={BP}")

    def sortkv_step(c, flat_c):
        iota = jnp.arange(BP, dtype=jnp.int32)
        keys = flat_c + (c * 0).astype(jnp.int32)
        sk, order = jax.lax.sort_key_val(keys, iota)
        inv = jnp.zeros(BP, jnp.int32).at[order].set(iota)
        return c + (sk.sum() + inv.sum()).astype(jnp.float32) * 1e-30
    device_ms(sortkv_step, (flat_c,), f"sort_key_val + scatter-inv BP={BP}")

    # fused einsum + segment-top2 epilogue (never materialize scores in HBM)
    blocks = jnp.asarray(rng.normal(size=(K, Cmax, D)).astype(np.float32),
                         dtype=jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    cents = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32))
    qlist = jnp.asarray(rng.integers(0, B, (K, q_cap)).astype(np.int32))
    rns = jnp.asarray(rng.random((K, Cmax)).astype(np.float32))
    SEG = 16  # segments over Cmax; top-2 per segment

    def fused_step(c, q, cents, blocks, qlist, rns):
        qf = (q + c)[qlist] - cents[:, None, :]
        dots = jnp.einsum("kbd,kcd->kbc", qf.astype(jnp.bfloat16), blocks,
                          preferred_element_type=jnp.float32)
        scores = 2.0 * dots - rns[:, None, :]
        r = scores.reshape(K, q_cap, SEG, Cmax // SEG)
        m1 = jnp.max(r, axis=3)
        a1 = jnp.argmax(r, axis=3).astype(jnp.int32)
        # mask the winner, take the second
        r2 = jnp.where(
            jax.nn.one_hot(a1, Cmax // SEG, dtype=bool, axis=3), -jnp.inf, r)
        m2 = jnp.max(r2, axis=3)
        a2 = jnp.argmax(r2, axis=3).astype(jnp.int32)
        out = (m1.sum() + m2.sum() + (a1.sum() + a2.sum()).astype(jnp.float32))
        return c + out * 1e-30
    device_ms(fused_step, (q, cents, blocks, qlist, rns),
              f"einsum+seg{SEG}-top2 fused [K={K},{q_cap},{Cmax}]")

    # materialized variant for comparison
    def mat_step(c, q, cents, blocks, qlist, rns):
        qf = (q + c)[qlist] - cents[:, None, :]
        dots = jnp.einsum("kbd,kcd->kbc", qf.astype(jnp.bfloat16), blocks,
                          preferred_element_type=jnp.float32)
        scores = 2.0 * dots - rns[:, None, :]
        # force materialization by consuming twice in different patterns
        g = scores[jnp.asarray([0, 1]), :, :].sum()
        m = jnp.max(scores, axis=2).sum()
        return c + (g + m) * 1e-30
    device_ms(mat_step, (q, cents, blocks, qlist, rns),
              "einsum + materialized scores (max consume)")

    # final reduce at [B, P*2*SEG]
    W = P * 2 * SEG
    cand = jnp.asarray(rng.normal(size=(B, W)).astype(np.float32))

    def final_topk_step(c, cand):
        s, i = jax.lax.top_k(cand + c, 40)
        return c + s[0, 0] * 1e-30
    device_ms(final_topk_step, (cand,), f"exact top_k [B={B},{W}]->40")

    def final_amk_step(c, cand):
        s, i = jax.lax.approx_max_k(cand + c, 40, recall_target=0.98)
        return c + s[0, 0] * 1e-30
    device_ms(final_amk_step, (cand,), f"approx_max_k [B={B},{W}]->40")

    # rescore gather at B=16384, n_sur=40
    N = 1 << 20
    sv = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    slots = jnp.asarray(rng.integers(0, N, (B, 40)).astype(np.int32))

    def rescore_step(c, sv, slots, q):
        rows = sv[slots] + c
        d = jnp.sum((rows - q[:, None, :]) ** 2, axis=2)
        s, i = jax.lax.top_k(-d, 10)
        return c + (s.sum()) * 1e-30
    device_ms(rescore_step, (sv, slots, q), f"rescore gather+topk [B={B},40]")

    # probe select at B=16384
    cns = jnp.sum(cents * cents, axis=1)

    def probe_step(c, q, cents, cns):
        aff = 2.0 * ((q + c) @ cents.T) - cns[None, :]
        s, i = jax.lax.approx_max_k(aff, P, recall_target=0.99)
        return c + s.sum() * 1e-30
    device_ms(probe_step, (q, cents, cns), f"probe select [B={B},{K}]->{P}")


if __name__ == "__main__":
    main()
