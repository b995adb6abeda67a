"""True DEVICE cost of each IVF/scan stage, immune to tunnel noise: run the
op L times inside one jit'd lax.scan (iterations serialized via carry
dependency); device time = (wall(L=hi) - wall(L=lo)) / (hi - lo).

Arrays are passed as jit ARGUMENTS (closed-over device arrays embed as
constants in the compile payload and overflow the remote-compile body)."""

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
    """step(carry, *args) -> new small carry. Times L serialized repeats."""
    import jax

    @partial(jax.jit, static_argnames=("L",))
    def loop(c, *arrays, L):
        def body(c, _):
            return step(c, *arrays), None
        c, _ = jax.lax.scan(body, c, None, length=L)
        return c

    import jax.numpy as jnp
    init = jnp.float32(0)
    results = {}
    for L in (LO, HI):
        results[L] = wall(lambda L=L: loop(init, *args, L=L)) * 1e3
    dev = (results[HI] - results[LO]) / (HI - LO)
    print(f"{name:42s} device {dev:8.3f} ms   (wall L1 {results[LO]:7.2f})",
          flush=True)
    return dev


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B, D, N = 2048, 128, 1 << 20
    K, Cmax, P, q_cap, n_sur = 4939, 384, 8, 16, 40

    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    v16 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), dtype=jnp.bfloat16)
    vns = jnp.sum(v16.astype(jnp.float32) ** 2, axis=1)

    def flat_step(c, q, v16, vns):
        s, i = jax.lax.approx_max_k(
            2.0 * jnp.dot((q + c).astype(jnp.bfloat16), v16.T,
                          preferred_element_type=jnp.float32)
            - vns[None, :], 10, recall_target=0.95)
        return c + s[0, 0] * 1e-30
    device_ms(flat_step, (q, v16, vns), f"flat scan B={B} N=1M")

    def mm_step(c, q, v16):
        dots = jnp.dot((q + c).astype(jnp.bfloat16), v16.T,
                       preferred_element_type=jnp.float32)
        return c + dots[0, 0] * 1e-30
    device_ms(mm_step, (q, v16), "  matmul only [2048,128]x[128,1M]")

    cents = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32))
    cns = jnp.sum(cents * cents, axis=1)

    def probe_step(c, q, cents, cns):
        aff = 2.0 * ((q + c) @ cents.T) - cns[None, :]
        s, i = jax.lax.approx_max_k(aff, P, recall_target=0.99)
        return c + s[0, 0] * 1e-30
    device_ms(probe_step, (q, cents, cns), f"probe select [B,{K}]->{P} approx")

    def probe_exact_step(c, q, cents, cns):
        aff = 2.0 * ((q + c) @ cents.T) - cns[None, :]
        s, i = jax.lax.top_k(aff, P)
        return c + s[0, 0] * 1e-30
    device_ms(probe_exact_step, (q, cents, cns), f"probe select [B,{K}]->{P} exact")

    W = P * Cmax
    s0 = jnp.asarray(rng.normal(size=(B, W)).astype(np.float32))

    def amk_step(c, s0):
        s, i = jax.lax.approx_max_k(s0 + c, n_sur, recall_target=0.98)
        return c + s[0, 0] * 1e-30
    device_ms(amk_step, (s0,), f"approx_max_k [B,{W}]->{n_sur}")

    def topk_step(c, s0):
        s, i = jax.lax.top_k(s0 + c, n_sur)
        return c + s[0, 0] * 1e-30
    device_ms(topk_step, (s0,), f"exact top_k [B,{W}]->{n_sur}")

    def seg_step(c, s0):
        segs = 256
        r = (s0 + c).reshape(B, segs, W // segs)
        m = jnp.max(r, axis=2)
        s, i = jax.lax.top_k(m, n_sur)
        return c + s[0, 0] * 1e-30
    device_ms(seg_step, (s0,), f"segmax256+topk [B,{W}]->{n_sur}")

    blocks = jnp.asarray(rng.normal(size=(K, Cmax, D)).astype(np.float32),
                         dtype=jnp.bfloat16)
    qlist = jnp.asarray(rng.integers(0, B, (K, q_cap)).astype(np.int32))

    def einsum_step(c, q, cents, blocks, qlist):
        qf = (q + c)[qlist] - cents[:, None, :]
        dots = jnp.einsum("kbd,kcd->kbc", qf.astype(jnp.bfloat16), blocks,
                          preferred_element_type=jnp.float32)
        return c + dots[0, 0, 0] * 1e-30
    device_ms(einsum_step, (q, cents, blocks, qlist),
              f"qgather+einsum [K={K},{q_cap},{Cmax}]")

    sc = jnp.asarray(rng.normal(size=(K, q_cap, Cmax)).astype(np.float32))
    flat_c = jnp.asarray(rng.integers(0, K, (B * P,)).astype(np.int32))
    col = jnp.asarray(rng.integers(0, q_cap, (B * P,)).astype(np.int32))

    def back_step(c, sc, flat_c, col):
        cand = (sc + c)[flat_c, col].reshape(B, P * Cmax)
        return c + cand[0, 0] * 1e-30
    device_ms(back_step, (sc, flat_c, col), f"score back-gather [BP,{Cmax}]")

    sv = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    slots = jnp.asarray(rng.integers(0, N, (B, n_sur)).astype(np.int32))

    def rescore_step(c, sv, slots, q):
        rows = sv[slots] + c
        d = jnp.sum((rows - q[:, None, :]) ** 2, axis=2)
        s, i = jax.lax.top_k(-d, 10)
        return c + s[0, 0] * 1e-30
    device_ms(rescore_step, (sv, slots, q), f"rescore gather+topk [B,{n_sur}]")

    # pair sort/inversion stage (argsort over BP)
    probe_idx = jnp.asarray(rng.integers(0, K, (B, P)).astype(np.int32))

    def sortinv_step(c, probe_idx):
        flat = probe_idx.reshape(B * P) + (c * 1e-30).astype(jnp.int32)
        order = jnp.argsort(flat)
        inv = jnp.argsort(order)
        return c + (order[0] + inv[0]).astype(jnp.float32) * 1e-30
    device_ms(sortinv_step, (probe_idx,), f"argsort+inv over BP={B*P}")


if __name__ == "__main__":
    main()
