"""Stage-by-stage DEVICE cost of ivf_query via scan-slope with DCE-proof
consumption (each stage's full intermediate is jnp.sum'd into the carry)."""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
D, K, Cmax, P = 128, 4939, 384, 8
q_cap = max(16, (B * P // K) * 4)
LO, HI, DEPTH = 1, 5, 3


def wall(fn, depth=DEPTH):
    outs = [fn() for _ in range(2)]
    _ = np.asarray(outs[-1]).ravel()[:1]
    t0 = time.perf_counter()
    outs = [fn() for _ in range(depth)]
    _ = np.asarray(outs[-1]).ravel()[:1]
    return (time.perf_counter() - t0) / depth


def main():
    import jax
    import jax.numpy as jnp
    from quiver_tpu.ops.scan import MASKED_DIST, NEG_BIG

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    blocks = jnp.asarray(rng.normal(size=(K, Cmax, D)).astype(np.float32),
                         dtype=jnp.bfloat16)
    cents = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32))
    cns = jnp.sum(cents * cents, axis=1)
    rns = jnp.asarray(rng.random((K, Cmax)).astype(np.float32))
    cap = 1 << 20
    bslot = jnp.asarray(rng.integers(0, cap, (K, Cmax)).astype(np.int32))
    bkeep = jnp.asarray(rng.random((K, Cmax)) < 0.99)
    sv = jnp.asarray(rng.normal(size=(cap, D)).astype(np.float32))

    def stage_fn(c, q, *, stage, seg=None):
        qq = q + c
        c_dots = qq @ cents.T
        c_aff = 2.0 * c_dots - cns[None, :]
        _, probe = jax.lax.approx_max_k(c_aff, P, recall_target=0.99)
        probe = probe.astype(jnp.int32)
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
        qf = qq[qsel] - cents[:, None, :]
        if stage == 3:
            return c + jnp.sum(qf) * 1e-30
        dots = jnp.einsum("kbd,kcd->kbc", qf.astype(jnp.bfloat16), blocks,
                          preferred_element_type=jnp.float32)
        if stage == 4:
            return c + jnp.sum(dots) * 1e-30
        caff_sel = jnp.take_along_axis(c_aff.T, qsel, axis=1)
        scores = 2.0 * dots - rns[:, None, :] + caff_sel[:, :, None]
        scores = jnp.where(bkeep[:, None, :] & have_q[:, :, None],
                           scores, NEG_BIG)
        if stage == 5:
            return c + jnp.sum(jnp.maximum(scores, -1e30)) * 1e-30
        col_orig = jnp.minimum(col, q_cap - 1)[inv]
        in_cap_orig = in_cap[inv]
        if seg is None:
            cand_s = jnp.where(in_cap_orig[:, None],
                               scores[flat_c, col_orig], NEG_BIG
                               ).reshape(B, P * Cmax)
            cand_slot = bslot[flat_c].reshape(B, P * Cmax)
            n_cand = P * Cmax
        else:
            width = Cmax // seg
            r = scores.reshape(K, q_cap, seg, width)
            a1 = jnp.argmax(r, axis=3).astype(jnp.int32)
            m1 = jnp.max(r, axis=3)
            lane = jax.lax.broadcasted_iota(jnp.int32, r.shape, 3)
            r2 = jnp.where(lane == a1[:, :, :, None], NEG_BIG, r)
            a2 = jnp.argmax(r2, axis=3).astype(jnp.int32)
            m2 = jnp.max(r2, axis=3)
            base = (jnp.arange(seg, dtype=jnp.int32) * width)[None, None, :]
            seg_m = jnp.concatenate([m1, m2], axis=2)
            seg_pos = jnp.concatenate([base + a1, base + a2], axis=2)
            if stage == 55:
                return c + (jnp.sum(jnp.maximum(seg_m, -1e30))
                            + jnp.sum(seg_pos.astype(jnp.float32))) * 1e-30
            pair_m = jnp.where(in_cap_orig[:, None],
                               seg_m[flat_c, col_orig], NEG_BIG)
            pair_pos = seg_pos[flat_c, col_orig]
            pair_slot = bslot[flat_c[:, None], pair_pos]
            cand_s = pair_m.reshape(B, P * 2 * seg)
            cand_slot = jnp.where(pair_m > NEG_BIG, pair_slot, -1
                                  ).reshape(B, P * 2 * seg)
            n_cand = P * 2 * seg
        if stage == 6:
            return c + (jnp.sum(jnp.maximum(cand_s, -1e30))
                        + jnp.sum(cand_slot.astype(jnp.float32))) * 1e-30
        n_sur = min(40, n_cand)
        if 2 * n_sur <= n_cand:
            best_s, sel = jax.lax.approx_max_k(cand_s, n_sur,
                                               recall_target=0.98)
        else:
            best_s, sel = jax.lax.top_k(cand_s, n_sur)
        best_slot = jnp.take_along_axis(cand_slot, sel, axis=1)
        best_slot = jnp.where(best_s > NEG_BIG, best_slot, -1)
        if stage == 7:
            return c + jnp.sum(best_slot.astype(jnp.float32)) * 1e-30
        rows = sv[jnp.maximum(best_slot, 0)].astype(jnp.float32)
        from quiver_tpu.ops.distance import distance_pairs
        qb = jnp.broadcast_to(qq[:, None, :], rows.shape).reshape(-1, D)
        dist = distance_pairs(qb, rows.reshape(-1, D), "euclidean"
                              ).reshape(B, n_sur)
        dist = jnp.where(best_slot >= 0, dist, MASKED_DIST)
        neg_top, posn = jax.lax.top_k(-dist, 10)
        return c + jnp.sum(neg_top) * 1e-30

    def measure(stage, seg, label):
        @partial(jax.jit, static_argnames=("L",))
        def loop(c, q, *, L):
            def body(c, _):
                return stage_fn(c, q, stage=stage, seg=seg), None
            c, _ = jax.lax.scan(body, c, None, length=L)
            return c
        res = {}
        for L in (LO, HI):
            res[L] = wall(lambda L=L: loop(jnp.float32(0), q0, L=L)) * 1e3
        dev = (res[HI] - res[LO]) / (HI - LO)
        print(f"{label:34s} device {dev:8.3f} ms  (wall L1 {res[LO]:6.1f})",
              flush=True)

    stages = sys.argv[2] if len(sys.argv) > 2 else "1,2,3,4,5,6,7,8"
    names = {1: "1 probe select", 2: "2 + sort/qlist/inv",
             3: "3 + q gather + residual", 4: "4 + einsum",
             5: "5 + affine + mask", 6: "6 + row back-gather [BP,Cmax]",
             7: "7 + approx reduce", 8: "8 + rescore (full, seg=None)"}
    for s in (int(x) for x in stages.split(",")):
        measure(s, None, names[s])


if __name__ == "__main__":
    main()
