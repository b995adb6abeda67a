"""Full ragged_dot IVF pipeline prototype: device time + true recall.

MoE-style formulation: (query, probe) pairs sorted by cluster = tokens
sorted by expert; cluster residual blocks = expert weights. Every pair is
scored (no q_cap drop). Sweeps K (cluster count) and P (probes) and B.

Usage: python benches/profile_ragged2.py [K] [P] [B ...]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches.truth import recall_with_ties

N, D, K_TOP = 1_000_000, 128, 10
N_CENTERS = 1000
TRUTH_CACHE = "/tmp/truth_f64_1m.npz"
LO, HI, DEPTH = 1, 5, 3
R = 16  # per-pair survivors


def clustered(n, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(N_CENTERS, D)).astype(np.float32)
    which = rng.integers(0, N_CENTERS, n)
    out = centers[which] + 0.25 * rng.normal(size=(n, D)).astype(np.float32)
    return out.astype(np.float32), centers, which


def wall(fn, depth=DEPTH):
    outs = [fn() for _ in range(2)]
    _ = np.asarray(outs[-1]).ravel()[:1]
    t0 = time.perf_counter()
    outs = [fn() for _ in range(depth)]
    _ = np.asarray(outs[-1]).ravel()[:1]
    return (time.perf_counter() - t0) / depth


def get_build(vecs, K):
    """K-means build (cached): centroids, assign, cmax."""
    cache = f"/tmp/ivf_build_1m_k{K}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return z["centroids"], z["assign"], int(z["cmax"])
    from quiver_tpu.ops.ivf_kernels import split_oversized, train_kmeans

    valid = np.ones(N, bool)
    cents, assign = train_kmeans(vecs, valid, K, n_iters=8, seed=0)
    cmax0 = -(-int(1.25 * N / K) // 128) * 128
    cents, assign = split_oversized(vecs, cents, assign, cmax0, seed=0)
    counts = np.bincount(assign, minlength=len(cents))
    cmax = -(-int(counts.max()) // 128) * 128
    np.savez(cache, centroids=cents, assign=assign, cmax=cmax)
    return cents, assign, cmax


def make_body(K, Cmax, P, n_sur):
    import jax
    import jax.numpy as jnp

    from quiver_tpu.ops.scan import MASKED_DIST, NEG_BIG

    def body(q, cents_j, cns_j, blocks_t, rns_j, bslot_flat, sv):
        B = q.shape[0]
        c_dots = q @ cents_j.T
        c_aff = 2.0 * c_dots - cns_j[None, :]  # -|q-c|^2 + |q|^2
        _, probe = jax.lax.approx_max_k(c_aff, P, recall_target=0.99)
        probe = probe.astype(jnp.int32)
        BP = B * P
        flat_c = probe.reshape(BP)
        order = jnp.argsort(flat_c)
        sorted_c = flat_c[order]
        b_of = (order // P).astype(jnp.int32)
        group_sizes = jnp.bincount(sorted_c, length=K).astype(jnp.int32)
        qp = (q[b_of] - cents_j[sorted_c]).astype(jnp.bfloat16)  # [BP, d]
        out = jax.lax.ragged_dot(
            qp, blocks_t, group_sizes, preferred_element_type=jnp.float32
        )  # [BP, Cmax] = (q-c)·(v-c)
        caff_p = jnp.take_along_axis(c_aff, probe, axis=1).reshape(BP)[order]
        scores = 2.0 * out - rns_j[sorted_c] + caff_p[:, None]
        s_pair, pos = jax.lax.approx_max_k(scores, R, recall_target=0.98)
        fpos = sorted_c[:, None] * Cmax + pos  # flat block position
        inv = jnp.argsort(order)
        cand_s = s_pair[inv].reshape(B, P * R)
        cand_f = fpos[inv].reshape(B, P * R)
        best_s, sel = jax.lax.approx_max_k(
            cand_s, n_sur, recall_target=0.98)
        best_f = jnp.take_along_axis(cand_f, sel, axis=1)
        slot = bslot_flat[best_f]  # [B, n_sur] element gather
        slot = jnp.where(best_s > NEG_BIG / 2, slot, -1)
        rows = sv[jnp.maximum(slot, 0)]
        dist = jnp.sum((rows - q[:, None, :]) ** 2, axis=2)
        dist = jnp.where(slot >= 0, dist, MASKED_DIST)
        neg_top, posn = jax.lax.top_k(-dist, K_TOP)
        return -neg_top, jnp.take_along_axis(slot, posn, axis=1)

    return body


def main():
    import jax
    import jax.numpy as jnp

    K_req = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    Bs = [int(x) for x in sys.argv[3:]] or [2048, 16384]

    print("devices:", jax.devices(), flush=True)
    vecs, _, _ = clustered(N)
    rng = np.random.default_rng(1)
    B0 = 2048
    queries = (vecs[:B0] + 0.1 * rng.normal(size=(B0, D))).astype(np.float32)
    z = np.load(TRUTH_CACHE)
    d10 = z["d"][:, K_TOP - 1]

    cents, assign, Cmax = get_build(vecs, K_req)
    K = len(cents)
    print(f"K={K} Cmax={Cmax} scan-frac={P*Cmax/N:.4f}", flush=True)

    # block layout on host
    order0 = np.argsort(assign, kind="stable")
    c_sorted = assign[order0]
    start = np.zeros(K + 1, np.int64)
    np.cumsum(np.bincount(c_sorted, minlength=K), out=start[1:])
    blocks = np.zeros((K, Cmax, D), np.float32)
    block_slot = np.full((K, Cmax), -1, np.int32)
    for c in range(K):
        r = order0[start[c]:start[c + 1]]
        blocks[c, :len(r)] = vecs[r] - cents[c]
        block_slot[c, :len(r)] = r
    rns = np.sum(blocks * blocks, axis=2).astype(np.float32)
    rns[block_slot < 0] = np.float32(1e30)  # pad rows never rank

    cents_j = jnp.asarray(cents, jnp.float32)
    cns_j = jnp.sum(cents_j * cents_j, axis=1)
    blocks_t = jnp.asarray(np.ascontiguousarray(
        blocks.transpose(0, 2, 1)), dtype=jnp.bfloat16)  # [K, d, Cmax]
    rns_j = jnp.asarray(rns)
    bslot_flat = jnp.asarray(block_slot.reshape(-1))
    sv = jnp.asarray(vecs)
    args = (cents_j, cns_j, blocks_t, rns_j, bslot_flat, sv)

    n_sur = 4 * K_TOP
    body = make_body(K, Cmax, P, n_sur)
    jbody = jax.jit(body)

    for B in Bs:
        reps = max(1, B // B0)
        qb = np.concatenate([
            queries if r == 0 else
            (queries + 0.01 * np.random.default_rng(100 + r).normal(
                size=queries.shape)).astype(np.float32)
            for r in range(reps)
        ])[:B]
        qj = jnp.asarray(qb)
        d, i = jbody(qj, *args)
        rec = recall_with_ties(np.asarray(i)[:B0], queries, vecs, d10, K_TOP)

        @partial(jax.jit, static_argnames=("L",))
        def loop(c, qj, *args, L):
            def step(c, _):
                d, i = body(qj + c, *args)
                return c + d[0, 0] * 1e-30, None
            c, _ = jax.lax.scan(step, c, None, length=L)
            return c

        res = {}
        for L in (LO, HI):
            res[L] = wall(lambda L=L: loop(jnp.float32(0), qj, *args, L=L)) * 1e3
        dms = (res[HI] - res[LO]) / (HI - LO)
        w = wall(lambda: jbody(qj, *args)) * 1e3
        print(f"B={B:6d}: device {dms:8.2f} ms = {B/dms*1e3:12,.0f} QPS  "
              f"wall/call {w:7.1f} ms  true recall {rec:.4f}", flush=True)


if __name__ == "__main__":
    main()
