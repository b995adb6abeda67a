"""Device cost of the fused IVF Pallas kernel alone, with ablations:
debug=0 full | 2 no-scatter | 3 matmul-only.

Usage: python benches/profile_fused.py [K] [P] [B]
"""

import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches.ivf_lab import clustered, get_build, wall

N, D = 1_000_000, 128
LO, HI = 1, 5


def _pow2(n, lo=8, hi=1 << 30):
    c = lo
    while c < n and c < hi:
        c *= 2
    return c


def main():
    import jax
    import jax.numpy as jnp

    from quiver_tpu.ops.ivf_pallas import fused_block_topw
    from quiver_tpu.ops.scan import NEG_BIG

    K_req = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 16384

    print("devices:", jax.devices(), flush=True)
    vecs, _, _ = clustered(N)
    cents, assign, Cmax = get_build(vecs, K_req)
    K = len(cents)
    print(f"K={K} Cmax={Cmax} B={B} P={P}", flush=True)

    order0 = np.argsort(assign, kind="stable")
    start = np.zeros(K + 1, np.int64)
    np.cumsum(np.bincount(assign[order0], minlength=K), out=start[1:])
    blocks = np.zeros((K, Cmax, D), np.float32)
    for c in range(K):
        r = order0[start[c]:start[c + 1]]
        blocks[c, :len(r)] = vecs[r] - cents[c]
    rns = np.sum(blocks * blocks, axis=2).astype(np.float32)

    blocks_t = jnp.asarray(np.ascontiguousarray(
        blocks.transpose(0, 2, 1)), dtype=jnp.bfloat16)
    del blocks
    bias = jnp.asarray(-rns)

    # synthetic pair layout mirroring _fused_candidates
    rng = np.random.default_rng(1)
    TQ, ALIGN = 32, 8
    Bc = max(1, min(B, 16384 // P))
    nchunks = B // Bc
    BPc = Bc * P
    probe = rng.integers(0, K, (nchunks, BPc)).astype(np.int32)
    probe.sort(axis=1)
    counts = np.stack([np.bincount(row, minlength=K) for row in probe])
    pc = -(-counts // ALIGN) * ALIGN
    starts = np.concatenate(
        [np.zeros((nchunks, 1), np.int64), np.cumsum(pc, axis=1)], axis=1)
    BPsp = BPc + (ALIGN - 1) * K + TQ
    BPsp = -(-BPsp // ALIGN) * ALIGN
    qp = np.zeros((nchunks, BPsp, D), np.float32)
    pair_pos = np.full((nchunks, BPsp), BPc, np.int32)
    for c in range(nchunks):
        perm = rng.permutation(BPc)
        i = 0
        for k in range(K):
            n_k = counts[c, k]
            s0 = starts[c, k]
            qp[c, s0:s0 + n_k] = rng.normal(size=(n_k, D))
            pair_pos[c, s0:s0 + n_k] = perm[i:i + n_k]
            i += n_k
    qp_j = jnp.asarray(qp, jnp.bfloat16)
    starts_j = jnp.asarray(starts.reshape(-1).astype(np.int32))
    counts_j = jnp.asarray(
        np.pad(counts, ((0, 0), (0, 1))).reshape(-1).astype(np.int32))
    pos_j = jnp.asarray(pair_pos.reshape(-1))
    BPout = BPc + 8

    for debug in (3, 2, 0):
        @partial(jax.jit, static_argnames=("L", "dbg"))
        def loop(cc, starts_j, counts_j, pos_j, qp_j, blocks_t, bias,
                 *, L, dbg):
            def step(cc, _):
                acc = fused_block_topw(
                    starts_j, counts_j, pos_j,
                    (qp_j + cc.astype(jnp.bfloat16)), blocks_t, bias,
                    K=K, Cmax=Cmax, BPout=BPout, TQ=TQ, debug=dbg)
                return cc + acc[0, 0, 0].astype(jnp.float32) * 1e-30, None
            cc, _ = jax.lax.scan(step, cc, None, length=L)
            return cc

        res = {}
        for L in (LO, HI):
            res[L] = wall(lambda L=L: loop(
                jnp.float32(0), starts_j, counts_j, pos_j, qp_j,
                blocks_t, bias, L=L, dbg=debug)) * 1e3
        dev = (res[HI] - res[LO]) / (HI - LO)
        name = {0: "full", 2: "no-scatter", 3: "matmul-only"}[debug]
        print(f"debug={debug} ({name:11s}): device {dev:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
