"""Component-level profile of the 1M x 128 scan on the real chip.

Times (pipelined, host-fetch-synced — block_until_ready lies through the
axon tunnel):
  1. current serving path (bf16 matmul + affine + approx top-k, B=2048)
  2. bf16 matmul alone (scores reduced to [B,8] slices to avoid 8.6GB fetch)
  3. bf16 matmul + affine + mask (no top-k)
  4. approx_max_k alone on a resident [B, N] score matrix
  5. int8 matmul alone
  6. int8 two-stage: int8 affine scores -> approx top-C -> f32 rescore -> top-k
     (+ recall vs f32 exact oracle)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, B, K = 1_000_000, 128, 2048, 10
DEPTH = 16


def timed(fn, *args, depth=DEPTH):
    outs = [fn(*args) for _ in range(2)]
    _ = np.asarray(outs[-1])[:1]  # warm + sync
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(depth)]
    _ = np.asarray(outs[-1])[:1]
    dt = (time.perf_counter() - t0) / depth
    return dt


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(N, D)).astype(np.float32)
    queries = (rng.normal(size=(B, D)).astype(np.float32) * 0.5 + vecs[:B] * 0.5)

    v32 = jax.device_put(vecs)
    v16 = jax.device_put(vecs.astype(jnp.bfloat16))
    q32 = jax.device_put(queries)
    ns = np.sum(vecs.astype(np.float64) ** 2, axis=1).astype(np.float32)
    ns_d = jax.device_put(ns)

    # int8 symmetric per-tensor quantization
    scale_v = np.abs(vecs).max() / 127.0
    v8 = jax.device_put(np.clip(np.round(vecs / scale_v), -127, 127).astype(np.int8))
    scale_q = np.abs(queries).max() / 127.0
    q8 = jax.device_put(np.clip(np.round(queries / scale_q), -127, 127).astype(np.int8))

    # 1. current path
    from quiver_tpu.ops.scan import flat_scan_topk

    def cur():
        return flat_scan_topk(
            q32, v16, jnp.ones((N,), bool), None, ns_d, ns_d,
            metric="euclidean", k=K, tile=N,
            compute_dtype=jnp.bfloat16, approx_recall=0.95,
        )[0]
    print("1 current path      :", timed(cur), flush=True)

    # 2. bf16 matmul alone
    @jax.jit
    def mm16(q, v):
        s = jnp.dot(q.astype(jnp.bfloat16), v.T,
                    preferred_element_type=jnp.float32)
        return s[:, ::131072]  # tiny slice keeps the matmul, kills the fetch
    print("2 bf16 matmul       :", timed(mm16, q32, v16), flush=True)

    # 3. + affine + mask
    @jax.jit
    def affine16(q, v, n):
        s = jnp.dot(q.astype(jnp.bfloat16), v.T,
                    preferred_element_type=jnp.float32)
        s = 2.0 * s - n[None, :]
        return s[:, ::131072]
    print("3 bf16 mm+affine    :", timed(affine16, q32, v16, ns_d), flush=True)

    # 4. full current formulation split: score then approx topk
    @jax.jit
    def score_then_topk(q, v, n):
        s = jnp.dot(q.astype(jnp.bfloat16), v.T,
                    preferred_element_type=jnp.float32)
        s = 2.0 * s - n[None, :]
        val, idx = jax.lax.approx_max_k(s, K, recall_target=0.95)
        return val
    print("4 mm+affine+topk    :", timed(score_then_topk, q32, v16, ns_d), flush=True)

    # 5. int8 matmul alone
    @jax.jit
    def mm8(q, v):
        s = jax.lax.dot_general(
            q, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        return s[:, ::131072]
    print("5 int8 matmul       :", timed(mm8, q8, v8), flush=True)

    # 6. int8 two-stage with f32 rescore
    C = 4 * K

    @jax.jit
    def two_stage(q8_, v8_, q32_, v32_, n):
        s = jax.lax.dot_general(
            q8_, v8_, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        # affine int-domain score: 2*qv*scale_q*scale_v - ||v||^2
        s = (2.0 * scale_q * scale_v) * s - n[None, :]
        _, cidx = jax.lax.approx_max_k(s, C, recall_target=0.95)
        cand = v32_[cidx]  # [B, C, d]
        d2 = jnp.sum((cand - q32_[:, None, :]) ** 2, axis=-1)
        nv, pos = jax.lax.top_k(-d2, K)
        return -nv, jnp.take_along_axis(cidx, pos, axis=1)
    print("6 int8 2-stage      :", timed(lambda: two_stage(q8, v8, q32, v32, ns_d)[0]), flush=True)

    # recall of 6 vs exact f32 oracle
    half = B // 2
    oracle = np.concatenate([
        np.asarray(flat_scan_topk(
            q32[i:i + half], v32, jnp.ones((N,), bool), None, ns_d, ns_d,
            metric="euclidean", k=K, tile=N)[1]) for i in (0, half)
    ])
    _, i8idx = two_stage(q8, v8, q32, v32, ns_d)
    i8 = np.asarray(i8idx)
    rec = np.mean([len(set(i8[b]) & set(oracle[b])) / K for b in range(B)])
    print("6 int8 recall@10    :", rec, flush=True)


if __name__ == "__main__":
    main()
