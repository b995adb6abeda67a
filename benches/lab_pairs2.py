"""Lab: redesigned IVF candidate path ("pairs2") — stage timing + recall.

Round-3 redesign driven by benches/profile_stages.py, which showed the
round-2 einsum path spends its device time NOT in the matmul (0.2 ms)
but in per-element gather overhead (~8-17 ns/elem on v5e) and redundant
reduce passes:

    slots (take_along_axis + flat gather at B*n_sur elems)  10.9 ms
    winreduce (5 passes incl. 2 argmax)                      4.2 ms
    epilogue ([K, q_cap, Cmax] f32 traffic, q_cap pads 2.7x) 3.8 ms
    qfgather (K*q_cap rows, 64% padding)                     2.0 ms

The redesign:
  * ragged_dot over pair-sorted query residuals [BP, d] — no q_cap
    padding anywhere (scores [BP, Cmax] is 2.7x smaller than
    [K, q_cap, Cmax]), no pair drops;
  * positions PACKED into score keys (f32 bitcast -> monotone i32,
    low 5 bits = lane) so every max pass yields positions for free —
    the windowed top-2 reduce drops from 5 passes to 2, argmax-free;
  * reduce BEFORE regroup: the inverse-permutation gather moves
    [BP, 2S] winner keys (320 B rows), not [*, Cmax] score rows;
  * selection by masked sum instead of take_along_axis (an [B, small]
    one-hot contraction is pure VPU; take_along_axis pays the flat
    per-element gather cost);
  * slot resolution DEFERRED to the final [B, k] winners: 163k gathered
    elements instead of 1.3M.

Usage: python benches/lab_pairs2.py [stage ...]
Env: B, P, W, NSUR, PROBE (iter|win), RECALL=1 to score recall.
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches.ivf_lab import wall

N, D, K_TOP = 1_000_000, 128, 10
LO, HI = 1, 5
BUILD_CACHE = "/tmp/quiver_bench_ivf_build_v2.npz"
TRUTH_CACHE = "/tmp/quiver_bench_truth_d10.npy"

STAGES = ["probe", "pairsort", "qpgather", "ragged", "winreduce",
          "regroup", "survivors", "select", "slots", "full"]


def main():
    import jax
    import jax.numpy as jnp

    from bench import clustered
    from quiver_tpu.ops.scan import MASKED_DIST, NEG_BIG

    B = int(os.environ.get("B", 16384))
    P = int(os.environ.get("P", 4))
    W = int(os.environ.get("W", 32))
    NSUR = int(os.environ.get("NSUR", 40))
    PROBE = os.environ.get("PROBE", "win")
    MATMUL = os.environ.get("MATMUL", "ragged")  # ragged | einsum
    QCAPF = int(os.environ.get("QCAPF", 2))
    which = sys.argv[1:] or STAGES

    print("devices:", jax.devices(), flush=True)
    vecs = clustered(N)
    if not os.path.exists(BUILD_CACHE):
        sys.exit(f"{BUILD_CACHE} missing — run bench_ivf.py (or bench.py) "
                 "once to build it")
    z = np.load(BUILD_CACHE)
    cents, assign, Cmax = z["centroids"], z["assign"], int(z["cmax"])
    K = len(cents)
    S = Cmax // W
    LB = W.bit_length() - 1  # lane bits (W pow2)
    print(f"K={K} Cmax={Cmax} B={B} P={P} W={W} S={S} PROBE={PROBE}",
          flush=True)

    order0 = np.argsort(assign, kind="stable")
    order0 = order0[assign[order0] >= 0]
    sorted_c0 = assign[order0]
    start = np.zeros(K + 1, np.int64)
    np.cumsum(np.bincount(sorted_c0, minlength=K), out=start[1:])
    blocks = np.zeros((K, Cmax, D), np.float32)
    block_slot = np.full((K, Cmax), -1, np.int32)
    for c in range(K):
        r = order0[start[c]:start[c + 1]]
        blocks[c, :len(r)] = vecs[r] - cents[c]
        block_slot[c, :len(r)] = r
    rns = np.sum(blocks * blocks, axis=2).astype(np.float32)

    cents_j = jnp.asarray(cents, jnp.float32)
    cns_j = jnp.sum(cents_j * cents_j, axis=1)
    blocks_t = jnp.asarray(np.ascontiguousarray(
        blocks.transpose(0, 2, 1)), dtype=jnp.bfloat16)
    del blocks
    # bias[K, Cmax]: keep ? -|v-c|^2 : NEG_BIG  (fused into the epilogue)
    bias_j = jnp.asarray(np.where(block_slot >= 0, -rns, NEG_BIG))
    bslot_flat = jnp.asarray(block_slot.reshape(-1))

    rng = np.random.default_rng(1)
    q0 = (vecs[rng.integers(0, N, B)] +
          0.1 * rng.normal(size=(B, D))).astype(np.float32)
    qj = jnp.asarray(q0)
    args = (qj, cents_j, cns_j, blocks_t, bias_j, bslot_flat)

    INT_MASK = jnp.int32(0x7FFFFFFF)
    LANE_MASK = jnp.int32(W - 1)

    def to_key(s):
        """f32 -> monotone i32 (order-preserving involution)."""
        b = jax.lax.bitcast_convert_type(s, jnp.int32)
        return b ^ (jax.lax.shift_right_arithmetic(b, 31) & INT_MASK)

    def pack(s):
        """f32 scores -> monotone i32 keys, low LB bits = lane index."""
        key = to_key(s)
        lane = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
        return (key & ~LANE_MASK) | (lane & LANE_MASK)

    def unpack_f32(key):
        """monotone i32 keys -> f32 whose float order matches int order
        (same involution; lane bits stay embedded as low mantissa)."""
        b = key ^ (jax.lax.shift_right_arithmetic(key, 31) & INT_MASK)
        return jax.lax.bitcast_convert_type(b, jnp.float32)

    def score_of(key):
        return unpack_f32(key & ~LANE_MASK)

    # key for a masked entry: well below any real score, lane 0, no NaN
    MASK_KEY = np.int32(
        (lambda b: b ^ ((b >> 31) & 0x7FFFFFFF))(
            np.float32(NEG_BIG).view(np.int32).item()) & ~(W - 1))

    def body(q, cents_j, cns_j, blocks_t, bias_j, bslot_flat, *, upto):
        B = q.shape[0]
        # ---- probe: top-P centroids
        c_dots = q @ cents_j.T  # f32[B, K]
        c_scores = 2.0 * c_dots - cns_j[None, :]
        if PROBE == "win" and K >= 256:
            # windowed top-2 per 128 + exact top-P over the 2*ceil(K/128)
            # window winners: 2 passes over [B, K] and one tiny top_k,
            # vs P argmax+scatter passes. Positions packed (7 bits).
            KP = -(-K // 128) * 128
            cw = jnp.pad(c_scores, ((0, 0), (0, KP - K)),
                         constant_values=NEG_BIG)
            b = jax.lax.bitcast_convert_type(cw, jnp.int32)
            keyc = b ^ (jax.lax.shift_right_arithmetic(b, 31) & INT_MASK)
            lane = jax.lax.broadcasted_iota(jnp.int32, cw.shape, 1)
            keyc = (keyc & ~jnp.int32(127)) | (lane & jnp.int32(127))
            kw = keyc.reshape(B, KP // 128, 128)
            m1 = jnp.max(kw, axis=2)
            r2 = jnp.where(kw == m1[:, :, None], MASK_KEY, kw)
            m2 = jnp.max(r2, axis=2)
            wins = jnp.concatenate([m1, m2], axis=1)  # [B, 2*KP/128]
            wkey, wsel = jax.lax.top_k(wins, P)
            nwin = KP // 128
            wid = jnp.where(wsel >= nwin, wsel - nwin, wsel)
            probe = wid * 128 + (wkey & jnp.int32(127))  # i32[B, P]
            # probe scores come straight off the keys (7-bit-quantized;
            # ~2^-16 relative, far below the bf16 stage noise) — no
            # take_along_axis gather
            caff = unpack_f32(wkey & ~jnp.int32(127))  # f32[B, P]
        else:
            sm = c_scores
            cols = []
            for _ in range(P):
                a = jnp.argmax(sm, axis=1).astype(jnp.int32)
                cols.append(a)
                sm = sm.at[jnp.arange(B), a].set(-jnp.inf)
            probe = jnp.stack(cols, axis=1)
            caff = jnp.take_along_axis(c_scores, probe, axis=1)  # [B, P]
        if upto == "probe":
            return probe[0, 0].astype(jnp.float32) * 1e-30
        # ---- pairsort
        BP = B * P
        flat_c = probe.reshape(BP)
        order = jnp.argsort(flat_c).astype(jnp.int32)
        sorted_c = flat_c[order]
        b_of = (order // P).astype(jnp.int32)
        group_sizes = jnp.bincount(sorted_c, length=K).astype(jnp.int32)
        if upto == "pairsort":
            return sorted_c[0].astype(jnp.float32) * 1e-30
        if MATMUL == "einsum":
            # per-cluster query lists (q_cap pads/drops) + batched einsum:
            # ragged_dot measures ~3% MXU utilization at ~46-row groups,
            # the uniform einsum runs at near-peak — trade gather padding
            # for it
            q_cap = 8
            while q_cap < max(8, (QCAPF * B * P) // K):
                q_cap *= 2
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
            if upto == "qpgather":
                return qf[0, 0, 0].astype(jnp.float32) * 1e-30
            dots = jnp.einsum(
                "kbd,kdc->kbc", qf, blocks_t,
                preferred_element_type=jnp.float32)  # f32[K, q_cap, Cmax]
            if upto == "ragged":
                return dots[0, 0, 0] * 1e-30
            scores = 2.0 * dots + jnp.where(
                have_q[:, :, None], bias_j[:, None, :], NEG_BIG)
            keys = pack(scores).reshape(K * q_cap, S, W)
            m1 = jnp.max(keys, axis=2)
            r2 = jnp.where(keys == m1[:, :, None], MASK_KEY, keys)
            m2 = jnp.max(r2, axis=2)
            wins = jnp.concatenate([m1, m2], axis=1)  # [K*q_cap, 2S]
            if upto == "winreduce":
                return wins[0, 0].astype(jnp.float32) * 1e-30
            # regroup by (cluster, rank) row id; dropped pairs -> MASK_KEY
            inv = jnp.argsort(order)  # original pair -> sorted position
            col_orig = jnp.minimum(col, q_cap - 1)[inv]
            src = flat_c * q_cap + col_orig
            cand = jnp.where(in_cap[inv][:, None], wins[src], MASK_KEY)
            cand = cand.reshape(B, P, 2 * S)
        else:
            # ---- qpgather: query residual rows in pair-sorted order
            qp = (q[b_of] - cents_j[sorted_c]).astype(jnp.bfloat16)
            if upto == "qpgather":
                return qp[0, 0].astype(jnp.float32) * 1e-30
            # ---- ragged grouped matmul: every pair scored, no drops.
            # DOT_OUT=bf16 keeps the [BP, Cmax] scores tensor in bf16 —
            # halves the dominant HBM traffic of the epilogue+reduce; the
            # values are residual-scale so bf16 rounding matches the noise
            # already in the dots, and lane-packing after upconvert to f32
            # costs no extra precision (bf16->f32 leaves mantissa bits
            # 0..15 zero, the lane bits live in 0..4)
            if os.environ.get("DOT_OUT", "f32") == "bf16":
                dots = jax.lax.ragged_dot(
                    qp, blocks_t, group_sizes,
                    preferred_element_type=jnp.bfloat16)
                if upto == "ragged":
                    return dots[0, 0].astype(jnp.float32) * 1e-30
                scores = (
                    2.0 * dots + bias_j[sorted_c].astype(jnp.bfloat16)
                ).astype(jnp.float32)
            else:
                dots = jax.lax.ragged_dot(
                    qp, blocks_t, group_sizes,
                    preferred_element_type=jnp.float32)  # f32[BP, Cmax]
                if upto == "ragged":
                    return dots[0, 0] * 1e-30
                # caff added post-regroup
                scores = 2.0 * dots + bias_j[sorted_c]
            # ---- epilogue + windowed top-2, positions packed (2 passes)
            keys = pack(scores).reshape(BP, S, W)
            m1 = jnp.max(keys, axis=2)
            r2 = jnp.where(keys == m1[:, :, None], MASK_KEY, keys)
            m2 = jnp.max(r2, axis=2)
            wins = jnp.concatenate([m1, m2], axis=1)  # i32[BP, 2S]
            if upto == "winreduce":
                return wins[0, 0].astype(jnp.float32) * 1e-30
            # ---- regroup: inverse permutation, SMALL rows (2S lanes)
            inv = (jnp.zeros(BP, jnp.int32)
                   .at[order].set(jnp.arange(BP, dtype=jnp.int32)))
            cand = wins[inv].reshape(B, P, 2 * S)
        # per-pair caff re-enters AFTER the within-pair reduce (it cannot
        # change within-pair ranking); add in f32 space, re-key, keep the
        # original lane bits
        cand_f = score_of(cand) + caff[:, :, None]
        cand = (to_key(cand_f) & ~LANE_MASK) | (cand & LANE_MASK)
        cand = cand.reshape(B, P * 2 * S)
        if upto == "regroup":
            return cand[0, 0].astype(jnp.float32) * 1e-30
        # ---- survivors: approx top-NSUR on f32-view keys
        n_sur = min(NSUR, P * 2 * S)
        fkeys = unpack_f32(cand)
        if 2 * n_sur <= P * 2 * S:
            fbest, sel = jax.lax.approx_max_k(
                fkeys, n_sur, recall_target=0.98)
        else:
            fbest, sel = jax.lax.top_k(fkeys, n_sur)
        if upto == "survivors":
            return fbest[0, 0] * 1e-30
        # ---- select: positions by arithmetic + masked sums (no gathers)
        best_key = jax.lax.bitcast_convert_type(fbest, jnp.int32)
        best_key = best_key ^ (
            jax.lax.shift_right_arithmetic(best_key, 31) & INT_MASK)
        j_of = sel // (2 * S)  # probe slot [B, n_sur]
        w_of = (sel % (2 * S)) % S  # window
        cl = jnp.zeros((B, n_sur), jnp.int32)
        for j in range(P):  # P is tiny: one-hot sum beats take_along_axis
            cl = cl + jnp.where(j_of == j, probe[:, j:j + 1], 0)
        flat = cl * Cmax + w_of * W + (best_key & LANE_MASK)
        # final top-k over the survivors
        top_f, pos2 = jax.lax.top_k(fbest, K_TOP)
        oh = pos2[:, :, None] == jnp.arange(n_sur)[None, None, :]
        flat_k = jnp.sum(jnp.where(oh, flat[:, None, :], 0), axis=2)
        key_k = jax.lax.bitcast_convert_type(top_f, jnp.int32)
        key_k = key_k ^ (
            jax.lax.shift_right_arithmetic(key_k, 31) & INT_MASK)
        score_k = jax.lax.bitcast_convert_type(
            key_k & ~LANE_MASK, jnp.float32)  # [B, K_TOP]
        if upto == "select":
            return flat_k[0, 0].astype(jnp.float32) * 1e-30
        # ---- slots: ONE deferred [B, K_TOP] flat gather
        slot = bslot_flat[flat_k]
        ok = score_k > NEG_BIG / 2
        slot = jnp.where(ok, slot, -1)
        if upto == "slots":
            return slot[0, 0].astype(jnp.float32) * 1e-30
        # ---- full: distance reconstruction
        qns = jnp.sum(q * q, axis=1, keepdims=True)
        d2 = jnp.maximum(qns - score_k, 0.0)
        dist = jnp.where(ok, d2, MASKED_DIST)
        if upto == "fullout":
            return dist, slot
        return dist[0, 0] * 1e-30

    # correctness + recall first (cheap: B_ORACLE queries)
    if os.environ.get("RECALL", "1") == "1":
        from benches.truth import recall_with_ties
        qr = (vecs[:2048] + 0.1 * np.random.default_rng(1).normal(
            size=(2048, D))).astype(np.float32)
        d10 = np.load(TRUTH_CACHE) if os.path.exists(TRUTH_CACHE) else None
        full = jax.jit(partial(body, upto="fullout"))
        dist, slot = full(jnp.asarray(qr), *args[1:])
        got = np.asarray(slot)
        if d10 is not None:
            rec = recall_with_ties(got, qr, vecs, d10, K_TOP)
            print(f"recall@10 = {rec:.4f}", flush=True)
        else:
            print("truth cache missing; skipped recall", flush=True)

    prev = 0.0
    for st in which:
        stage_body = partial(body, upto=st)

        @partial(jax.jit, static_argnames=("L",))
        def loop(c, *arrays, L, sb=stage_body):
            def step(c, _):
                return c + sb(arrays[0] + c, *arrays[1:]), None
            c, _ = jax.lax.scan(step, c, None, length=L)
            return c

        res = {}
        for L in (LO, HI):
            res[L] = wall(lambda L=L: loop(jnp.float32(0), *args, L=L)) * 1e3
        dev = (res[HI] - res[LO]) / (HI - LO)
        print(f"upto {st:10s}: device {dev:8.2f} ms  (+{dev - prev:7.2f})",
              flush=True)
        prev = dev


if __name__ == "__main__":
    main()
