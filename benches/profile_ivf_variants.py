"""Device cost of probe-matmul + epilogue FORMULATION variants:

V1  einsum kbd,kcd->kbc (q_cap mid, Cmax lanes)  + seg-top2 over lanes
V2  dot_general kcd,kbd->kcb (Cmax sublanes, q_cap lanes) + seg-top2 over
    sublanes — no layout transpose, queries stay lane-parallel
V3  V2 with a single packed max (value and index packed into one f32 via
    value-in-high-bits trick avoided; plain max + argmax pair)
V4  V2 at bf16 scores
Also the raw dot_general without epilogue, for both operand orders.
"""

import sys
import os
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L_FIX, DEPTH = 8, 3


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
    K, Cmax, D = 4939, 384, 128
    SEG = 16
    W = Cmax // SEG

    def measure(step, args, name):
        # ONE compile per variant: wall(L=8)/8 — the per-call dispatch
        # overhead adds the same ~1 ms/8 bias to every row.
        @partial(jax.jit, static_argnames=("L",))
        def loop(c, *arrays, L):
            def body(c, _):
                return step(c, *arrays), None
            c, _ = jax.lax.scan(body, c, None, length=L)
            return c
        per = wall(lambda: loop(jnp.float32(0), *args, L=L_FIX)) * 1e3 / L_FIX
        print(f"{name:46s} ~device {per:8.3f} ms", flush=True)

    for q_cap in (128,):
        qf = jnp.asarray(
            rng.normal(size=(K, q_cap, D)).astype(np.float32),
            dtype=jnp.bfloat16)
        blocks = jnp.asarray(
            rng.normal(size=(K, Cmax, D)).astype(np.float32),
            dtype=jnp.bfloat16)
        rns = jnp.asarray(rng.random((K, Cmax)).astype(np.float32))

        def raw_kbc(c, qf, blocks):
            dots = jax.lax.dot_general(
                qf + c.astype(jnp.bfloat16), blocks,
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # [K, q_cap, Cmax]
            return c + jnp.sum(dots) * 1e-30
        measure(raw_kbc, (qf, blocks), f"q_cap={q_cap} dot_general kbc raw")

        def raw_kcb(c, qf, blocks):
            dots = jax.lax.dot_general(
                blocks + c.astype(jnp.bfloat16), qf,
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # [K, Cmax, q_cap]
            return c + jnp.sum(dots) * 1e-30
        measure(raw_kcb, (qf, blocks), f"q_cap={q_cap} dot_general kcb raw")

        def v1(c, qf, blocks, rns):
            dots = jax.lax.dot_general(
                qf + c.astype(jnp.bfloat16), blocks,
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            scores = 2.0 * dots - rns[:, None, :]
            r = scores.reshape(K, q_cap, SEG, W)
            a1 = jnp.argmax(r, axis=3).astype(jnp.int32)
            m1 = jnp.max(r, axis=3)
            lane = jax.lax.broadcasted_iota(jnp.int32, r.shape, 3)
            r2 = jnp.where(lane == a1[:, :, :, None], -3e38, r)
            a2 = jnp.argmax(r2, axis=3).astype(jnp.int32)
            m2 = jnp.max(r2, axis=3)
            return c + (jnp.sum(m1) + jnp.sum(m2)
                        + jnp.sum((a1 + a2).astype(jnp.float32))) * 1e-30
        measure(v1, (qf, blocks, rns), f"q_cap={q_cap} V1 kbc + seg over lanes")

        def v2(c, qf, blocks, rns):
            dots = jax.lax.dot_general(
                blocks + c.astype(jnp.bfloat16), qf,
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # [K, Cmax, q_cap]
            scores = 2.0 * dots - rns[:, :, None]
            r = scores.reshape(K, SEG, W, q_cap)
            a1 = jnp.argmax(r, axis=2).astype(jnp.int32)
            m1 = jnp.max(r, axis=2)
            sub = jax.lax.broadcasted_iota(jnp.int32, r.shape, 2)
            r2 = jnp.where(sub == a1[:, :, None, :], -3e38, r)
            a2 = jnp.argmax(r2, axis=2).astype(jnp.int32)
            m2 = jnp.max(r2, axis=2)
            return c + (jnp.sum(m1) + jnp.sum(m2)
                        + jnp.sum((a1 + a2).astype(jnp.float32))) * 1e-30
        measure(v2, (qf, blocks, rns), f"q_cap={q_cap} V2 kcb + seg over sublanes")

        def v2_top1(c, qf, blocks, rns):
            dots = jax.lax.dot_general(
                blocks + c.astype(jnp.bfloat16), qf,
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            scores = 2.0 * dots - rns[:, :, None]
            r = scores.reshape(K, SEG * 2, W // 2, q_cap)
            a1 = jnp.argmax(r, axis=2).astype(jnp.int32)
            m1 = jnp.max(r, axis=2)
            return c + (jnp.sum(m1)
                        + jnp.sum(a1.astype(jnp.float32))) * 1e-30
        measure(v2_top1, (qf, blocks, rns),
                f"q_cap={q_cap} V2t1 kcb + seg32-top1 sublanes")


if __name__ == "__main__":
    main()
