"""Stage-level profile of ivf_query's linear (gather-free) formulation on
the real chip. Historical result that shaped the kernel (TPU v5e, B=2048,
K=4096, Cmax=512, grouped-gather formulation): block gather 6.9 ms,
+einsum 8.1 ms, +top_k(30) 28.2 ms, +approx_max_k 10.7 ms — the gather and
the full-sort top_k dominated, hence the resident-block einsum +
approx_max_k design (ops/ivf_kernels.py docstring)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, D, K, Cmax, P, q_cap, kk = 2048, 128, 4096, 512, 8, 32, 30
DEPTH = 8


def timed(fn):
    outs = [fn() for _ in range(2)]
    _ = np.asarray(outs[-1]).ravel()[:1]
    t0 = time.perf_counter()
    outs = [fn() for _ in range(DEPTH)]
    _ = np.asarray(outs[-1]).ravel()[:1]
    return (time.perf_counter() - t0) / DEPTH


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    blocks = jnp.asarray(
        rng.normal(size=(K, Cmax, D)).astype(np.float32), dtype=jnp.bfloat16
    )
    cents = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32))
    qlist = jnp.asarray(rng.integers(0, B, (K, q_cap)).astype(np.int32))
    rns = jnp.asarray(rng.random((K, Cmax)).astype(np.float32) * 100)

    @jax.jit
    def probe_topk(q, cents):
        c_dots = q @ cents.T
        return jax.lax.top_k(2.0 * c_dots, P)[1][:, 0]
    print("probe matmul+top_k  :", timed(lambda: probe_topk(q, cents)), flush=True)

    @jax.jit
    def pair_sort(q, cents):
        c_dots = q @ cents.T
        probe = jax.lax.top_k(2.0 * c_dots, P)[1]
        order = jnp.argsort(probe.reshape(-1))
        return order[::512]
    print("... + pair argsort  :", timed(lambda: pair_sort(q, cents)), flush=True)

    @jax.jit
    def einsum_res(q, blocks, qlist, cents):
        qf = (q[qlist] - cents[:, None, :]).astype(jnp.bfloat16)
        dots = jnp.einsum("kbd,kcd->kbc", qf, blocks,
                          preferred_element_type=jnp.float32)
        return dots[:, 0, ::128]
    print("resident einsum     :", timed(lambda: einsum_res(q, blocks, qlist, cents)), flush=True)

    @jax.jit
    def ein_affine(q, blocks, qlist, cents, rns):
        qf = (q[qlist] - cents[:, None, :]).astype(jnp.bfloat16)
        dots = jnp.einsum("kbd,kcd->kbc", qf, blocks,
                          preferred_element_type=jnp.float32)
        s = 2.0 * dots - rns[:, None, :]
        return s[:, 0, ::128]
    print("... + affine        :", timed(lambda: ein_affine(q, blocks, qlist, cents, rns)), flush=True)

    @jax.jit
    def approx_topk(q, blocks, qlist, cents, rns):
        qf = (q[qlist] - cents[:, None, :]).astype(jnp.bfloat16)
        dots = jnp.einsum("kbd,kcd->kbc", qf, blocks,
                          preferred_element_type=jnp.float32)
        s = 2.0 * dots - rns[:, None, :]
        v, i = jax.lax.approx_max_k(s, kk, recall_target=0.95)
        return v[:, 0, 0]
    print("... + approx_max_k  :", timed(lambda: approx_topk(q, blocks, qlist, cents, rns)), flush=True)

    # the whole kernel end-to-end on synthetic layout
    from quiver_tpu.ops.ivf_kernels import ivf_query

    block_slot = jnp.asarray(
        rng.integers(0, K * Cmax, (K, Cmax)).astype(np.int32)
    )
    inv = jnp.ones((K, Cmax), jnp.float32)
    keep = jnp.ones((K * Cmax,), bool)
    store_vectors = jnp.asarray(
        rng.normal(size=(K * Cmax // 2, D)).astype(np.float32)
    )
    block_slot = block_slot % (K * Cmax // 2)
    keep = keep[: K * Cmax // 2]
    cns = jnp.sum(cents * cents, axis=1)

    def full():
        return ivf_query(
            q, cents, cns, blocks, block_slot, rns, inv, keep, store_vectors,
            metric="euclidean", k=10, n_probe=P, q_cap=q_cap,
        )[0]
    print("ivf_query end-to-end:", timed(full), flush=True)


if __name__ == "__main__":
    main()
