"""v4 variants: regroup as P separate B-row gathers, optional bf16
scores, window width sweep — chasing the cluster->query crossing cost.

Usage: python benches/profile_ragged8.py [K] [P] [W] [QCAPF] [VARIANT] [B...]
VARIANT: basew (v3 regroup) | pgather | pgather16 (bf16 scores)
"""

import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches.ivf_lab import clustered, get_build, wall
from benches.truth import recall_with_ties

N, D, K_TOP = 1_000_000, 128, 10
TRUTH_CACHE = "/tmp/truth_f64_1m.npz"
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
    QCAPF = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    VARIANTS = (sys.argv[5] if len(sys.argv) > 5 else "pgather").split(",")
    Bs = [int(x) for x in sys.argv[6:]] or [16384]

    print("devices:", jax.devices(), flush=True)
    vecs, _, _ = clustered(N)
    rng = np.random.default_rng(1)
    B0 = 2048
    queries = (vecs[:B0] + 0.1 * rng.normal(size=(B0, D))).astype(np.float32)
    z = np.load(TRUTH_CACHE)
    d10 = z["d"][:, K_TOP - 1]

    cents, assign, Cmax = get_build(vecs, K_req)
    K = len(cents)
    S = Cmax // W
    print(f"K={K} Cmax={Cmax} P={P} W={W} S={S} QCAPF={QCAPF} "
          f"variants={VARIANTS}", flush=True)

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
    args = (cents_j, cns_j, blocks_t, rns_j, bslot_flat)

    def make_body(B, VARIANT):
        q_cap = _pow2(max(8, QCAPF * B * P // K), lo=8, hi=_pow2(B))

        def body(q, cents_j, cns_j, blocks_t, rns_j, bslot_flat):
            c_dots = q @ cents_j.T
            c_aff = 2.0 * c_dots - cns_j[None, :]
            s = c_aff
            probes = []
            for _ in range(P):
                a = jnp.argmax(s, axis=1).astype(jnp.int32)
                probes.append(a)
                s = s.at[jnp.arange(B), a].set(-jnp.inf)
            probe = jnp.stack(probes, axis=1)  # [B, P]
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
            have_q = qlist >= 0
            qsel = jnp.maximum(qlist, 0)
            qf = (q[qsel] - cents_j[:, None, :]).astype(jnp.bfloat16)
            dots = jnp.einsum(
                "kbd,kdc->kbc", qf, blocks_t,
                preferred_element_type=jnp.float32)  # [K, q_cap, Cmax]
            caff_sel = jnp.take_along_axis(c_aff.T, qsel, axis=1)
            scores = 2.0 * dots - rns_j[:, None, :] + caff_sel[:, :, None]
            scores = jnp.where(have_q[:, :, None], scores, NEG_BIG)
            if VARIANT == "pgather16":
                scores = scores.astype(jnp.bfloat16)
            inv = jnp.argsort(order)
            col_b = jnp.minimum(col, q_cap - 1)[inv].reshape(B, P)
            in_cap_b = in_cap[inv].reshape(B, P)
            if VARIANT == "basew":
                rows = jnp.where(
                    in_cap_b.reshape(BP)[:, None],
                    scores[flat_c, col_b.reshape(BP)], NEG_BIG
                ).reshape(B, P * S, W)
            else:
                parts = [
                    jnp.where(
                        in_cap_b[:, j:j + 1],
                        scores[probe[:, j], col_b[:, j]], NEG_BIG)
                    for j in range(P)
                ]
                rows = jnp.stack(parts, axis=1).reshape(B, P * S, W)
            rows = rows.astype(jnp.float32)
            m1 = jnp.max(rows, axis=2)
            a1 = jnp.argmax(rows, axis=2).astype(jnp.int32)
            lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 2)
            r2 = jnp.where(lane == a1[:, :, None], -jnp.inf, rows)
            m2 = jnp.max(r2, axis=2)
            a2 = jnp.argmax(r2, axis=2).astype(jnp.int32)
            cand_s = jnp.concatenate([m1, m2], axis=1)
            segb = jnp.tile(
                (jnp.arange(S, dtype=jnp.int32) * W)[None, :], (1, P))
            cl = jnp.repeat(probe, S, axis=1)
            f1 = cl * Cmax + segb + a1
            f2 = cl * Cmax + segb + a2
            cand_f = jnp.concatenate([f1, f2], axis=1)
            n_sur = min(NSUR, 2 * P * S)
            if 2 * n_sur <= 2 * P * S:
                best_s, sel = jax.lax.approx_max_k(
                    cand_s, n_sur, recall_target=0.98)
            else:
                best_s, sel = jax.lax.top_k(cand_s, n_sur)
            best_f = jnp.take_along_axis(cand_f, sel, axis=1)
            slot = bslot_flat[best_f]
            slot = jnp.where(best_s > NEG_BIG / 2, slot, -1)
            qns = jnp.sum(q * q, axis=1, keepdims=True)
            dist = jnp.where(slot >= 0, qns - best_s, MASKED_DIST)
            # exact top-k over the n_sur (scores noisy only at bf16 level)
            neg_top, posn = jax.lax.top_k(-dist, K_TOP)
            return -neg_top, jnp.take_along_axis(slot, posn, axis=1)

        return body

    for B in Bs:
      for _round in range(2):
        for VARIANT in VARIANTS:
            body = make_body(B, VARIANT)
            jbody = jax.jit(body)
            reps = max(1, B // B0)
            qb = np.concatenate([
                queries if r == 0 else
                (queries + 0.01 * np.random.default_rng(100 + r).normal(
                    size=queries.shape)).astype(np.float32)
                for r in range(reps)
            ])[:B]
            qj = jnp.asarray(qb)
            d, i = jbody(qj, *args)
            rec = recall_with_ties(
                np.asarray(i)[:B0], queries, vecs, d10, K_TOP)

            @partial(jax.jit, static_argnames=("L",))
            def loop(c, qj, *args, L, body=body):
                def step(c, _):
                    d, i = body(qj + c, *args)
                    return c + d[0, 0] * 1e-30, None
                c, _ = jax.lax.scan(step, c, None, length=L)
                return c

            res = {}
            for L in (LO, HI):
                res[L] = wall(
                    lambda L=L: loop(jnp.float32(0), qj, *args, L=L)) * 1e3
            dms = (res[HI] - res[LO]) / (HI - LO)
            w = wall(lambda: jbody(qj, *args)) * 1e3
            print(f"{VARIANT:10s} B={B:6d}: device {dms:8.2f} ms = "
                  f"{B/dms*1e3:12,.0f} QPS  wall/call {w:7.1f} ms  "
                  f"true recall {rec:.4f}", flush=True)


if __name__ == "__main__":
    main()
