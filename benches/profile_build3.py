"""Stage timing of the batch-build pipeline pieces at realistic shapes:
flat-scan candidates, select_neighbors, connect_level."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def wall(fn, depth=3):
    outs = [fn() for _ in range(2)]
    _ = np.asarray(jax_first(outs[-1])).ravel()[:1]
    t0 = time.perf_counter()
    outs = [fn() for _ in range(depth)]
    _ = np.asarray(jax_first(outs[-1])).ravel()[:1]
    return (time.perf_counter() - t0) / depth


def jax_first(x):
    while isinstance(x, (tuple, list)):
        x = x[0]
    return x


def main():
    import jax
    import jax.numpy as jnp

    from quiver_tpu.ops.hnsw_kernels import connect_level, select_neighbors
    from quiver_tpu.ops.scan import flat_scan_topk

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    cap, d, B = 131072, 128, 8192
    deg, kc = 32, 129
    vecs = jnp.asarray(rng.normal(size=(cap, d)).astype(np.float32))
    valid = jnp.asarray(np.arange(cap) < 100000)
    ns = jnp.sum(vecs * vecs, axis=1)
    inv = jax.lax.rsqrt(jnp.maximum(ns, 1e-30))
    q = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))

    def scan_fn():
        return flat_scan_topk(
            q, vecs, valid, None, ns, inv,
            metric="euclidean", k=kc, tile=32768,
            compute_dtype=jnp.bfloat16, approx_recall=0.95)

    t = wall(scan_fn)
    print(f"flat_scan k={kc} tile=32768: {t*1e3:8.1f} ms", flush=True)

    cand_d, cand_i = scan_fn()

    def sel_fn():
        return select_neighbors(
            q, cand_i, cand_d, vecs, metric="euclidean", m=deg,
            compute_dtype=jnp.bfloat16)

    t = wall(sel_fn)
    print(f"select_neighbors C={kc} m={deg}: {t*1e3:8.1f} ms", flush=True)

    sel_i, _ = sel_fn()
    adj = jnp.full((cap, deg), -1, jnp.int32)
    fill = jnp.zeros(cap, jnp.int32)
    pos = jnp.asarray(
        np.where(np.arange(cap) < 100000, np.arange(cap), -1).astype(np.int32))
    slots = jnp.asarray(np.arange(B).astype(np.int32) + 50000)
    connect = jnp.ones(B, bool)

    for ub, eb in ((4096, 64), (256, 64), (4096, 16), (64, 8)):
        def conn_fn(ub=ub, eb=eb):
            return connect_level(
                adj, fill, pos, vecs, slots, connect, sel_i,
                metric="euclidean", u_budget=ub, e_budget=eb,
                compute_dtype=jnp.bfloat16)

        t = wall(conn_fn)
        print(f"connect_level u={ub} e={eb}:  {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
