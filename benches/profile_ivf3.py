"""Bisect ivf_query's real body stage-by-stage on the chip: replicates the
kernel with early returns to find where the end-to-end 124 ms hides (the
stage sum in profile_ivf.py is only ~25 ms)."""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, D, K, Cmax, P, q_cap, kk = 2048, 128, 4096, 512, 8, 32, 30
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
    from quiver_tpu.ops.scan import MASKED_DIST, NEG_BIG

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    blocks = jnp.asarray(
        rng.normal(size=(K, Cmax, D)).astype(np.float32), dtype=jnp.bfloat16
    )
    cents = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32))
    cns = jnp.sum(cents * cents, axis=1)
    rns = jnp.asarray(rng.random((K, Cmax)).astype(np.float32) * 100)
    cap = K * Cmax // 2
    block_slot = jnp.asarray(
        (rng.integers(0, cap, (K, Cmax))).astype(np.int32)
    )
    inv = jnp.ones((K, Cmax), jnp.float32)
    keep = jnp.ones((cap,), bool)
    store_vectors = jnp.asarray(rng.normal(size=(cap, D)).astype(np.float32))

    @partial(jax.jit, static_argnames=("stage",))
    def body(q, cents, cns, blocks, block_slot, rns, inv, keep, sv, *, stage):
        q_ns = jnp.sum(q * q, axis=1)
        c_dots = q @ cents.T
        c_aff = 2.0 * c_dots - cns[None, :]
        _, probe = jax.lax.top_k(c_aff, P)
        if stage == 1:
            return probe[:, 0]
        BP = B * P
        flat_c = probe.reshape(BP)
        order = jnp.argsort(flat_c)
        sorted_c = flat_c[order]
        b_of = (order // P).astype(jnp.int32)
        p_of = (order % P).astype(jnp.int32)
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_c[1:] != sorted_c[:-1]]
        )
        pos = jnp.arange(BP, dtype=jnp.int32)
        start_pos = jax.lax.associative_scan(
            jnp.maximum, jnp.where(is_start, pos, 0)
        )
        rank = pos - start_pos
        in_cap = rank < q_cap
        col = jnp.where(in_cap, rank, q_cap)
        qlist = (
            jnp.full((K, q_cap), -1, jnp.int32)
            .at[sorted_c, col]
            .set(b_of, mode="drop")
        )
        if stage == 2:
            return qlist[:, 0]
        have_q = qlist >= 0
        qsel = jnp.maximum(qlist, 0)
        qf = q[qsel] - cents[:, None, :]
        dots = jnp.einsum(
            "kbd,kcd->kbc",
            qf.astype(jnp.bfloat16),
            blocks,
            preferred_element_type=jnp.float32,
        )
        if stage == 3:
            return dots[:, 0, ::128]
        caff_sel = jnp.take_along_axis(c_aff.T, qsel, axis=1)
        scores = 2.0 * dots - rns[:, None, :] + caff_sel[:, :, None]
        ok = (
            have_q[:, :, None]
            & (block_slot[:, None, :] >= 0)
            & keep[jnp.maximum(block_slot, 0)][:, None, :]
        )
        scores = jnp.where(ok, scores, NEG_BIG)
        if stage == 4:
            return scores[:, 0, ::128]
        top_s, top_c = jax.lax.approx_max_k(scores, kk, recall_target=0.95)
        if stage == 5:
            return top_s[:, 0, 0]
        top_slot = jnp.take_along_axis(
            jnp.broadcast_to(block_slot[:, None, :], scores.shape), top_c, axis=2
        )
        if stage == 6:
            return top_slot[:, 0, 0]
        pair_s = jnp.where(in_cap[:, None], top_s[sorted_c, col % q_cap], NEG_BIG)
        pair_slot = jnp.where(in_cap[:, None], top_slot[sorted_c, col % q_cap], -1)
        cand_s = jnp.full((B, P, kk), NEG_BIG, jnp.float32).at[b_of, p_of].set(pair_s)
        cand_slot = jnp.full((B, P, kk), -1, jnp.int32).at[b_of, p_of].set(pair_slot)
        cand_s = cand_s.reshape(B, P * kk)
        cand_slot = cand_slot.reshape(B, P * kk)
        if stage == 7:
            return cand_s[:, 0]
        n_sur = min(10 * 3, P * kk)
        best_s, sel = jax.lax.top_k(cand_s, n_sur)
        best_slot = jnp.take_along_axis(cand_slot, sel, axis=1)
        best_slot = jnp.where(best_s > NEG_BIG, best_slot, -1)
        if stage == 8:
            return best_slot[:, 0]
        rows = sv[jnp.maximum(best_slot, 0)].astype(jnp.float32)
        from quiver_tpu.ops.distance import distance_pairs

        qb = jnp.broadcast_to(q[:, None, :], rows.shape).reshape(-1, D)
        dist = distance_pairs(qb, rows.reshape(-1, D), "euclidean").reshape(B, n_sur)
        dist = jnp.where(best_slot >= 0, dist, MASKED_DIST)
        neg_top, posn = jax.lax.top_k(-dist, 10)
        return -neg_top[:, 0]

    for stage in range(1, 10):
        dt = timed(lambda s=stage: body(
            q, cents, cns, blocks, block_slot, rns, inv, keep, store_vectors,
            stage=s))
        print(f"stage {stage}: {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
