"""Stage profile of the v3 (einsum + query-major seg-top-2) pipeline.

Usage: python benches/profile_ragged7.py [K] [P] [W] [B] [QCAPF] [stages]
"""

import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches.profile_ragged2 import clustered, get_build, wall

N, D, K_TOP = 1_000_000, 128, 10
LO, HI = 1, 5
NSUR = 40


def _pow2(n, lo=8, hi=1 << 30):
    c = lo
    while c < n and c < hi:
        c *= 2
    return c


def main():
    import jax
    import jax.numpy as jnp

    from quiver_tpu.ops.scan import MASKED_DIST, NEG_BIG

    K_req = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    B = int(sys.argv[4]) if len(sys.argv) > 4 else 16384
    QCAPF = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    stages = [int(x) for x in (sys.argv[6].split(",") if len(sys.argv) > 6
                               else range(1, 9))]

    print("devices:", jax.devices(), flush=True)
    vecs, _, _ = clustered(N)
    cents, assign, Cmax = get_build(vecs, K_req)
    K = len(cents)
    S = Cmax // W
    q_cap = _pow2(max(8, QCAPF * B * P // K), lo=8, hi=_pow2(B))
    print(f"K={K} Cmax={Cmax} B={B} P={P} W={W} q_cap={q_cap}", flush=True)

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
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_c[1:] != sorted_c[:-1]])
        pos = jnp.arange(BP, dtype=jnp.int32)
        start_pos = jax.lax.associative_scan(
            jnp.maximum, jnp.where(is_start, pos, 0))
        rank = pos - start_pos
        in_cap = rank < q_cap
        col = jnp.where(in_cap, rank, q_cap)
        qlist = (jnp.full((K, q_cap), -1, jnp.int32)
                 .at[sorted_c, col].set(b_of, mode="drop"))
        inv = jnp.argsort(order)
        if stage == 2:
            return c + (jnp.sum(qlist.astype(jnp.float32))
                        + jnp.sum(inv.astype(jnp.float32))) * 1e-30
        have_q = qlist >= 0
        qsel = jnp.maximum(qlist, 0)
        qf = (qq[qsel] - cents_j[:, None, :]).astype(jnp.bfloat16)
        if stage == 3:
            return c + jnp.sum(qf.astype(jnp.float32)) * 1e-30
        dots = jnp.einsum(
            "kbd,kdc->kbc", qf, blocks_t,
            preferred_element_type=jnp.float32)
        if stage == 4:
            return c + jnp.sum(dots) * 1e-30
        caff_sel = jnp.take_along_axis(c_aff.T, qsel, axis=1)
        scores = 2.0 * dots - rns_j[:, None, :] + caff_sel[:, :, None]
        scores = jnp.where(have_q[:, :, None], scores, NEG_BIG)
        if stage == 5:
            return c + jnp.sum(jnp.maximum(scores, -1e30)) * 1e-30
        col_orig = jnp.minimum(col, q_cap - 1)[inv]
        in_cap_orig = in_cap[inv]
        rows = jnp.where(
            in_cap_orig[:, None], scores[flat_c, col_orig], NEG_BIG
        ).reshape(B, P * S, W)
        if stage == 6:
            return c + jnp.sum(jnp.maximum(rows, -1e30)) * 1e-30
        m1 = jnp.max(rows, axis=2)
        a1 = jnp.argmax(rows, axis=2).astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 2)
        r2 = jnp.where(lane == a1[:, :, None], -jnp.inf, rows)
        m2 = jnp.max(r2, axis=2)
        a2 = jnp.argmax(r2, axis=2).astype(jnp.int32)
        cand_s = jnp.concatenate([m1, m2], axis=1)
        segb = jnp.tile((jnp.arange(S, dtype=jnp.int32) * W)[None, :], (1, P))
        cl = jnp.repeat(probe, S, axis=1)
        f1 = cl * Cmax + segb + a1
        f2 = cl * Cmax + segb + a2
        cand_f = jnp.concatenate([f1, f2], axis=1)
        if stage == 7:
            return c + (jnp.sum(jnp.maximum(cand_s, -1e30))
                        + jnp.sum(cand_f.astype(jnp.float32))) * 1e-30
        n_sur = min(NSUR, 2 * P * S)
        best_s, sel = jax.lax.approx_max_k(cand_s, n_sur, recall_target=0.98)
        best_f = jnp.take_along_axis(cand_f, sel, axis=1)
        slot = bslot_flat[best_f]
        slot = jnp.where(best_s > NEG_BIG / 2, slot, -1)
        rows_v = sv[jnp.maximum(slot, 0)]
        dist = jnp.sum((rows_v - qq[:, None, :]) ** 2, axis=2)
        dist = jnp.where(slot >= 0, dist, MASKED_DIST)
        neg_top, posn = jax.lax.top_k(-dist, K_TOP)
        return c + jnp.sum(neg_top) * 1e-30

    names = {1: "1 probe iter-argmax", 2: "2 + sort/qlist/inv",
             3: "3 + qf gather", 4: "4 + einsum",
             5: "5 + epilogue/mask", 6: "6 + big-row regroup",
             7: "7 + segtop2 qmajor", 8: "8 full (+approx/slot/rescore)"}
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
        print(f"{names[stage]:32s} device {dev:8.2f} ms  "
              f"(wall L1 {res[LO]:7.1f})", flush=True)


if __name__ == "__main__":
    main()
