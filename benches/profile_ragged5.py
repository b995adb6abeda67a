"""Stage profile of the v2 (seg-top-2) ragged pipeline.

Usage: python benches/profile_ragged5.py [K] [P] [W] [B] [stages]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches.profile_ragged2 import clustered, get_build, wall

N, D, K_TOP = 1_000_000, 128, 10
LO, HI = 1, 5
NSUR = 40


def main():
    import jax
    import jax.numpy as jnp

    from quiver_tpu.ops.scan import MASKED_DIST, NEG_BIG

    K_req = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    B = int(sys.argv[4]) if len(sys.argv) > 4 else 16384
    stages = [int(x) for x in (sys.argv[5].split(",") if len(sys.argv) > 5
                               else range(1, 8))]

    print("devices:", jax.devices(), flush=True)
    vecs, _, _ = clustered(N)
    cents, assign, Cmax = get_build(vecs, K_req)
    K = len(cents)
    S = Cmax // W
    print(f"K={K} Cmax={Cmax} B={B} P={P} W={W}", flush=True)

    order0 = np.argsort(assign, kind="stable")
    start = np.zeros(K + 1, np.int64)
    np.cumsum(np.bincount(assign[order0], minlength=K), out=start[1:])
    blocks = np.zeros((K, Cmax, D), np.float32)
    block_slot = np.full((K, Cmax), -1, np.int32)
    for c in range(K):
        r = order0[start[c]:start[c + 1]]
        blocks[c, :len(r)] = vecs[r] - cents[c]
        block_slot[c, :len(r)] = r
    rns = np.sum(blocks * blocks, axis=2).astype(np.float32)
    rns[block_slot < 0] = np.float32(1e30)

    cents_j = jnp.asarray(cents, jnp.float32)
    cns_j = jnp.sum(cents_j * cents_j, axis=1)
    blocks_t = jnp.asarray(np.ascontiguousarray(
        blocks.transpose(0, 2, 1)), dtype=jnp.bfloat16)
    del blocks
    rns_j = jnp.asarray(rns)
    bslot_flat = jnp.asarray(block_slot.reshape(-1))
    sv = jnp.asarray(vecs)
    rng = np.random.default_rng(1)
    q0 = jnp.asarray((vecs[:B] + 0.1 * rng.normal(size=(B, D))
                      ).astype(np.float32))
    args = (q0, cents_j, cns_j, blocks_t, rns_j, bslot_flat, sv)

    def stage_fn(c, q, cents_j, cns_j, blocks_t, rns_j, bslot_flat, sv,
                 *, stage):
        qq = q + c
        c_dots = qq @ cents_j.T
        c_aff = 2.0 * c_dots - cns_j[None, :]
        s = c_aff
        probes = []
        for _ in range(P):
            a = jnp.argmax(s, axis=1).astype(jnp.int32)
            probes.append(a)
            s = s.at[jnp.arange(B), a].set(-jnp.inf)
        probe = jnp.stack(probes, axis=1)
        if stage == 1:
            return c + jnp.sum(probe.astype(jnp.float32)) * 1e-30
        BP = B * P
        flat_c = probe.reshape(BP)
        order = jnp.argsort(flat_c)
        sorted_c = flat_c[order]
        b_of = (order // P).astype(jnp.int32)
        group_sizes = jnp.bincount(sorted_c, length=K).astype(jnp.int32)
        if stage == 2:
            return c + (jnp.sum(group_sizes.astype(jnp.float32))
                        + jnp.sum(b_of.astype(jnp.float32))) * 1e-30
        qp = (qq[b_of] - cents_j[sorted_c]).astype(jnp.bfloat16)
        out = jax.lax.ragged_dot(
            qp, blocks_t, group_sizes, preferred_element_type=jnp.float32)
        if stage == 3:
            return c + jnp.sum(out) * 1e-30
        caff_p = jnp.take_along_axis(c_aff, probe, axis=1).reshape(BP)[order]
        scores = 2.0 * out - rns_j[sorted_c] + caff_p[:, None]
        r = scores.reshape(BP, S, W)
        m1 = jnp.max(r, axis=2)
        a1 = jnp.argmax(r, axis=2).astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, r.shape, 2)
        r2 = jnp.where(lane == a1[:, :, None], -jnp.inf, r)
        m2 = jnp.max(r2, axis=2)
        a2 = jnp.argmax(r2, axis=2).astype(jnp.int32)
        if stage == 4:
            return c + (jnp.sum(m1) + jnp.sum(m2)
                        + jnp.sum((a1 + a2).astype(jnp.float32))) * 1e-30
        segbase = (jnp.arange(S, dtype=jnp.int32) * W)[None, :]
        base = sorted_c[:, None] * Cmax
        s_pair = jnp.concatenate([m1, m2], axis=1)
        f_pair = jnp.concatenate(
            [base + segbase + a1, base + segbase + a2], axis=1)
        inv = jnp.zeros(BP, jnp.int32).at[order].set(
            jnp.arange(BP, dtype=jnp.int32))
        cand_s = s_pair[inv].reshape(B, P * 2 * S)
        cand_f = f_pair[inv].reshape(B, P * 2 * S)
        n_sur = min(NSUR, P * 2 * S)
        best_s, sel = jax.lax.approx_max_k(cand_s, n_sur, recall_target=0.98)
        best_f = jnp.take_along_axis(cand_f, sel, axis=1)
        if stage == 5:
            return c + (jnp.sum(best_s) +
                        jnp.sum(best_f.astype(jnp.float32))) * 1e-30
        slot = bslot_flat[best_f]
        slot = jnp.where(best_s > NEG_BIG / 2, slot, -1)
        if stage == 6:
            return c + jnp.sum(slot.astype(jnp.float32)) * 1e-30
        rows = sv[jnp.maximum(slot, 0)]
        dist = jnp.sum((rows - qq[:, None, :]) ** 2, axis=2)
        dist = jnp.where(slot >= 0, dist, MASKED_DIST)
        neg_top, posn = jax.lax.top_k(-dist, K_TOP)
        return c + jnp.sum(neg_top) * 1e-30

    names = {1: "1 probe iter-argmax", 2: "2 + sort/groups",
             3: "3 + qp + ragged_dot", 4: "4 + epilogue + segtop2",
             5: "5 + regroup + approx40", 6: "6 + slot gather",
             7: "7 full (+rescore)"}
    for stage in stages:
        @partial(jax.jit, static_argnames=("L",))
        def loop(c, *args, L, stage=stage):
            def step(c, _):
                return stage_fn(c, *args, stage=stage), None
            c, _ = jax.lax.scan(step, c, None, length=L)
            return c
        res = {}
        for L in (LO, HI):
            res[L] = wall(lambda L=L: loop(jnp.float32(0), *args, L=L)) * 1e3
        dev = (res[HI] - res[LO]) / (HI - LO)
        print(f"{names[stage]:28s} device {dev:8.2f} ms  "
              f"(wall L1 {res[LO]:7.1f})", flush=True)


if __name__ == "__main__":
    main()
