"""Stage-level profile of ivf_query on the real chip."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, D, K, Cmax, P, b_max, kk = 2048, 128, 4096, 512, 8, 16, 30
G = min(K, B * P) + (B * P) // b_max
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

    print("devices:", jax.devices(), "G:", G, flush=True)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    blocks = jnp.asarray(
        rng.normal(size=(K, Cmax, D)).astype(np.float32).astype(jnp.bfloat16)
    )
    gcluster = jnp.asarray(rng.integers(0, K, G).astype(np.int32))
    qlist = jnp.asarray(rng.integers(0, B, (G, b_max)).astype(np.int32))
    ns = jnp.asarray(rng.random((K, Cmax)).astype(np.float32) * 100)

    @jax.jit
    def gather_only(blocks, gcluster):
        return blocks[gcluster].sum(axis=(1, 2))
    print("gather blk_g        :", timed(lambda: gather_only(blocks, gcluster)), flush=True)

    @jax.jit
    def einsum_only(q, blocks, gcluster, qlist):
        qg = q[qlist].astype(jnp.bfloat16)
        blk = blocks[gcluster]
        dots = jnp.einsum("gbd,gcd->gbc", qg, blk,
                          preferred_element_type=jnp.float32)
        return dots[:, 0, ::128]
    print("gather+einsum       :", timed(lambda: einsum_only(q, blocks, gcluster, qlist)), flush=True)

    @jax.jit
    def ein_affine(q, blocks, gcluster, qlist, ns):
        qg = q[qlist].astype(jnp.bfloat16)
        blk = blocks[gcluster]
        dots = jnp.einsum("gbd,gcd->gbc", qg, blk,
                          preferred_element_type=jnp.float32)
        s = 2.0 * dots - ns[gcluster][:, None, :]
        return s[:, 0, ::128]
    print("gather+einsum+affine:", timed(lambda: ein_affine(q, blocks, gcluster, qlist, ns)), flush=True)

    @jax.jit
    def full_topk(q, blocks, gcluster, qlist, ns):
        qg = q[qlist].astype(jnp.bfloat16)
        blk = blocks[gcluster]
        dots = jnp.einsum("gbd,gcd->gbc", qg, blk,
                          preferred_element_type=jnp.float32)
        s = 2.0 * dots - ns[gcluster][:, None, :]
        v, i = jax.lax.top_k(s, kk)
        return v[:, 0, 0]
    print("... + top_k(30)     :", timed(lambda: full_topk(q, blocks, gcluster, qlist, ns)), flush=True)

    @jax.jit
    def approx_topk(q, blocks, gcluster, qlist, ns):
        qg = q[qlist].astype(jnp.bfloat16)
        blk = blocks[gcluster]
        dots = jnp.einsum("gbd,gcd->gbc", qg, blk,
                          preferred_element_type=jnp.float32)
        s = 2.0 * dots - ns[gcluster][:, None, :]
        v, i = jax.lax.approx_max_k(s.reshape(-1, Cmax), kk, recall_target=0.95)
        return v[0, 0]
    print("... + approx_max_k  :", timed(lambda: approx_topk(q, blocks, gcluster, qlist, ns)), flush=True)

    # flat (unbatched-G) formulation reference: dense matmul same flops
    q2 = jnp.asarray(rng.normal(size=(G * b_max, D)).astype(np.float32))

    @jax.jit
    def dense_ref(q2, blocks):
        w = blocks.reshape(K * Cmax, D)[: Cmax * 128]  # 64k rows
        return (q2.astype(jnp.bfloat16) @ w.T)[::512, ::512]
    print("dense matmul ref    :", timed(lambda: dense_ref(q2, blocks)), flush=True)


if __name__ == "__main__":
    main()
