"""Measure (a) the per-dispatch floor through the axon tunnel, (b) the cost
of candidate-reduce alternatives at IVF shapes, (c) flat-scan scaling with
batch size — to find whether serving QPS is dispatch-bound and which reduce
formulation to use."""

import sys
import os
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEPTH = 16


def timed(fn, depth=DEPTH):
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

    # (a) dispatch floor: trivial elementwise kernel, small in/out
    x = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    f_triv = jax.jit(lambda x: x * 1.0001 + 1.0)
    print(f"trivial jit:            {timed(lambda: f_triv(x))*1e3:8.2f} ms", flush=True)

    # chained trivial: 8 dependent launches inside one jit
    @jax.jit
    def f_chain(x):
        for _ in range(8):
            x = x * 1.0001 + 1.0
        return x
    print(f"8-chain trivial jit:    {timed(lambda: f_chain(x))*1e3:8.2f} ms", flush=True)

    # (b) reduce alternatives at [B, 3072] -> 40
    B, W, n_sur = 2048, 3072, 40
    s = jnp.asarray(rng.normal(size=(B, W)).astype(np.float32))

    f_amk = jax.jit(lambda s: jax.lax.approx_max_k(s, n_sur, recall_target=0.98))
    print(f"approx_max_k [2048,3072]->40:  {timed(lambda: f_amk(s))*1e3:8.2f} ms", flush=True)

    f_amk2 = jax.jit(lambda s: jax.lax.approx_max_k(
        s, n_sur, recall_target=0.98, aggregate_to_topk=False))
    print(f"  same, no aggregate:          {timed(lambda: f_amk2(s))*1e3:8.2f} ms", flush=True)

    f_top = jax.jit(lambda s: jax.lax.top_k(s, n_sur))
    print(f"exact top_k:                   {timed(lambda: f_top(s))*1e3:8.2f} ms", flush=True)

    def seg_max(s):
        # 128 segments of width 24: per-segment max+argmax (one pass), then
        # exact top-k over the 128 segment winners
        segs = 128
        r = s.reshape(B, segs, W // segs)
        m = jnp.max(r, axis=2)
        a = jnp.argmax(r, axis=2)
        top_s, top_i = jax.lax.top_k(m, n_sur)
        col = jnp.take_along_axis(a, top_i, axis=1)
        return top_s, top_i * (W // segs) + col
    f_seg = jax.jit(seg_max)
    print(f"segmax(128)+topk40:            {timed(lambda: f_seg(s))*1e3:8.2f} ms", flush=True)

    # (c) flat-scan batch scaling (bf16 corpus, affine score, approx reduce)
    N, D = 1 << 20, 128
    v16 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), dtype=jnp.bfloat16)
    vns = jnp.sum(v16.astype(jnp.float32) ** 2, axis=1)

    @partial(jax.jit, static_argnames=("k",))
    def scan(q, v, ns, k=10):
        dots = jnp.dot(q.astype(jnp.bfloat16), v.T, preferred_element_type=jnp.float32)
        score = 2.0 * dots - ns[None, :]
        return jax.lax.approx_max_k(score, k, recall_target=0.95)

    for B2 in (2048, 4096, 8192, 16384):
        qb = jnp.asarray(rng.normal(size=(B2, D)).astype(np.float32))
        dt = timed(lambda qb=qb: scan(qb, v16, vns), depth=8)
        print(f"flat scan B={B2:6d}: {dt*1e3:8.2f} ms = {B2/dt:12,.0f} QPS", flush=True)

    # (d) probe-selection matmul alone at [2048, 4939]
    K = 4939
    cents = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32))
    cns = jnp.sum(cents * cents, axis=1)
    q = jnp.asarray(rng.normal(size=(2048, D)).astype(np.float32))

    @jax.jit
    def probe_sel(q, cents, cns):
        c_aff = 2.0 * (q @ cents.T) - cns[None, :]
        return jax.lax.approx_max_k(c_aff, 8, recall_target=0.99)
    print(f"probe select [2048x4939]->8:   {timed(lambda: probe_sel(q, cents, cns))*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
