"""Stage-by-stage DEVICE cost of the exact headline-bench serving path
(einsum formulation, bench build cache, B=16384, P=4, rescore=False).

Cumulative prefixes of the pipeline are timed with the scan-slope method;
successive differences give per-stage device cost. Usage:

    python benches/profile_stages.py [stages...]   # default: all
"""

import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches.ivf_lab import wall

N, D, K_TOP = 1_000_000, 128, 10
LO, HI = 1, 5
from bench import BUILD_CACHE  # shared with bench.py (v2: permuted ids)

STAGES = [
    "probe",      # centroid scores + iterated argmax top-P
    "pairsort",   # pair argsort + qlist build
    "qfgather",   # q[qsel] row gather [K, q_cap, d]
    "einsum",     # grouped matmul -> dots [K, q_cap, Cmax]
    "epilogue",   # affine score reconstruction + keep mask
    "regroup",    # per-probe gathers back to query-major rows
    "winreduce",  # windowed top-2 per W lanes
    "survivors",  # approx_max_k to n_sur
    "slots",      # flat block_slot element gather
    "full",       # final top-k + distance reconstruction
]


def main():
    import jax
    import jax.numpy as jnp

    from bench import clustered
    from quiver_tpu.ops.scan import MASKED_DIST, NEG_BIG

    B = int(os.environ.get("B", 16384))
    P = int(os.environ.get("P", 4))
    W = int(os.environ.get("W", 32))
    NSUR = int(os.environ.get("NSUR", 40))
    which = sys.argv[1:] or STAGES

    print("devices:", jax.devices(), flush=True)
    vecs = clustered(N)
    z = np.load(BUILD_CACHE)
    cents, assign, Cmax = z["centroids"], z["assign"], int(z["cmax"])
    K = len(cents)
    S = Cmax // W
    q_cap_factor = 2
    q_cap = 8
    while q_cap < max(8, int(np.ceil(q_cap_factor * B * P / K))):
        q_cap *= 2
    print(f"K={K} Cmax={Cmax} B={B} P={P} q_cap={q_cap} S={S}", flush=True)

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
    rns_j = jnp.asarray(rns)
    keep_j = jnp.asarray(block_slot >= 0)
    bslot_flat = jnp.asarray(block_slot.reshape(-1))

    rng = np.random.default_rng(1)
    q0 = (vecs[rng.integers(0, N, B)] +
          0.1 * rng.normal(size=(B, D))).astype(np.float32)
    qj = jnp.asarray(q0)
    args = (qj, cents_j, cns_j, blocks_t, rns_j, keep_j, bslot_flat)

    def body(q, cents_j, cns_j, blocks_t, rns_j, keep_j, bslot_flat,
             *, upto):
        out = []
        # ---- probe
        c_dots = q @ cents_j.T
        c_aff = 2.0 * c_dots - cns_j[None, :]
        s = c_aff
        probes = []
        for _ in range(P):
            a = jnp.argmax(s, axis=1).astype(jnp.int32)
            probes.append(a)
            s = s.at[jnp.arange(B), a].set(-jnp.inf)
        probe = jnp.stack(probes, axis=1)
        if upto == "probe":
            return probe[0, 0].astype(jnp.float32) * 1e-30
        # ---- pairsort
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
        if upto == "pairsort":
            return qlist[0, 0].astype(jnp.float32) * 1e-30
        # ---- qfgather
        have_q = qlist >= 0
        qsel = jnp.maximum(qlist, 0)
        qf = (q[qsel] - cents_j[:, None, :]).astype(jnp.bfloat16)
        if upto == "qfgather":
            return qf[0, 0, 0].astype(jnp.float32) * 1e-30
        # ---- einsum
        dots = jnp.einsum("kbd,kdc->kbc", qf, blocks_t,
                          preferred_element_type=jnp.float32)
        if upto == "einsum":
            return dots[0, 0, 0] * 1e-30
        # ---- epilogue
        caff_sel = jnp.take_along_axis(c_aff.T, qsel, axis=1)
        scores = 2.0 * dots - rns_j[:, None, :] + caff_sel[:, :, None]
        scores = jnp.where(keep_j[:, None, :] & have_q[:, :, None],
                           scores, NEG_BIG)
        if upto == "epilogue":
            return scores[0, 0, 0] * 1e-30
        # ---- regroup (per-probe gathers)
        inv = jnp.argsort(order)
        col_b = jnp.minimum(col, q_cap - 1)[inv].reshape(B, P)
        in_cap_b = in_cap[inv].reshape(B, P)
        parts = [
            jnp.where(in_cap_b[:, j:j + 1],
                      scores[probe[:, j], col_b[:, j]], NEG_BIG)
            for j in range(P)
        ]
        rows = jnp.stack(parts, axis=1)
        if upto == "regroup":
            return rows[0, 0, 0] * 1e-30
        rows = rows.reshape(B, P * S, W)
        # ---- winreduce
        m1 = jnp.max(rows, axis=2)
        a1 = jnp.argmax(rows, axis=2).astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 2)
        r2 = jnp.where(lane == a1[:, :, None], -jnp.inf, rows)
        m2 = jnp.max(r2, axis=2)
        a2 = jnp.argmax(r2, axis=2).astype(jnp.int32)
        cand_s = jnp.concatenate([m1, m2], axis=1)
        if upto == "winreduce":
            return cand_s[0, 0] * 1e-30
        segb = jnp.tile((jnp.arange(S, dtype=jnp.int32) * W)[None, :], (1, P))
        cl = jnp.repeat(probe, S, axis=1)
        f1 = cl * Cmax + segb + a1
        f2 = cl * Cmax + segb + a2
        cand_f = jnp.concatenate([f1, f2], axis=1)
        # ---- survivors
        n_sur = min(NSUR, 2 * P * S)
        if 2 * n_sur <= 2 * P * S:
            best_s, sel = jax.lax.approx_max_k(
                cand_s, n_sur, recall_target=0.98)
        else:
            best_s, sel = jax.lax.top_k(cand_s, n_sur)
        if upto == "survivors":
            return best_s[0, 0] * 1e-30
        best_f = jnp.take_along_axis(cand_f, sel, axis=1)
        # ---- slots
        best_slot = bslot_flat[best_f]
        best_slot = jnp.where(best_s > NEG_BIG / 2, best_slot, -1)
        if upto == "slots":
            return best_slot[0, 0].astype(jnp.float32) * 1e-30
        # ---- full: final top-k + distance reconstruction
        top_s, posn = jax.lax.top_k(best_s, K_TOP)
        out_slot = jnp.take_along_axis(best_slot, posn, axis=1)
        qns = jnp.sum(q * q, axis=1, keepdims=True)
        d2 = jnp.maximum(qns - top_s, 0.0)
        dist = jnp.where(out_slot >= 0, d2, MASKED_DIST)
        return dist[0, 0] * 1e-30

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
