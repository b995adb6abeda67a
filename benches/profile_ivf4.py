"""Bisect the CURRENT ivf_query (one-reduce-per-query formulation,
ops/ivf_kernels.py) stage-by-stage on the chip, at the bench_ivf shapes
(B=2048, K~4939, Cmax=384, P=8, q_cap=16, oversample=4)."""

import sys
import os
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, D, K, Cmax, P, q_cap = 2048, 128, 4939, 384, 8, 16
k, oversample = 10, 4
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
    cap = 1 << 20
    block_slot = jnp.asarray(
        (rng.integers(0, cap, (K, Cmax))).astype(np.int32)
    )
    binv = jnp.ones((K, Cmax), jnp.float32)
    bkeep = jnp.asarray(rng.random((K, Cmax)) < 0.53)
    store_vectors = jnp.asarray(rng.normal(size=(cap, D)).astype(np.float32))

    @partial(jax.jit, static_argnames=("stage",))
    def body(q, cents, cns, blocks, block_slot, rns, binv, bkeep, sv, *, stage):
        c_dots = q @ cents.T
        c_aff = 2.0 * c_dots - cns[None, :]
        _, probe = jax.lax.approx_max_k(c_aff, P, recall_target=0.99)
        probe = probe.astype(jnp.int32)
        if stage == 1:  # probe selection
            return probe[:, 0]
        BP = B * P
        flat_c = probe.reshape(BP)
        order = jnp.argsort(flat_c)
        sorted_c = flat_c[order]
        b_of = (order // P).astype(jnp.int32)
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
        if stage == 2:  # + pair inversion / qlist build
            return qlist[:, 0]
        have_q = qlist >= 0
        qsel = jnp.maximum(qlist, 0)
        qf = q[qsel]  # f32[K, q_cap, d]
        qf = qf - cents[:, None, :]
        if stage == 3:  # + query gather
            return qf[:, 0, 0]
        dots = jnp.einsum(
            "kbd,kcd->kbc",
            qf.astype(jnp.bfloat16),
            blocks,
            preferred_element_type=jnp.float32,
        )
        if stage == 4:  # + block einsum
            return dots[:, 0, ::128]
        caff_sel = jnp.take_along_axis(c_aff.T, qsel, axis=1)
        scores = 2.0 * dots - rns[:, None, :] + caff_sel[:, :, None]
        scores = jnp.where(
            bkeep[:, None, :] & have_q[:, :, None], scores, NEG_BIG
        )
        if stage == 5:  # + affine + mask
            return scores[:, 0, ::128]
        inv = jnp.argsort(order)
        col_orig = jnp.minimum(col, q_cap - 1)[inv]
        in_cap_orig = in_cap[inv]
        cand_s = jnp.where(
            in_cap_orig[:, None], scores[flat_c, col_orig], NEG_BIG
        ).reshape(B, P * Cmax)
        cand_slot = block_slot[flat_c].reshape(B, P * Cmax)
        if stage == 6:  # + scores/slots back-gather to queries
            return cand_s[:, 0] + cand_slot[:, 0]
        n_sur = min(k * oversample, P * Cmax)
        best_s, sel = jax.lax.approx_max_k(cand_s, n_sur, recall_target=0.98)
        best_slot = jnp.take_along_axis(cand_slot, sel, axis=1)
        best_slot = jnp.where(best_s > NEG_BIG, best_slot, -1)
        if stage == 7:  # + survivor reduce
            return best_slot[:, 0]
        rows = sv[jnp.maximum(best_slot, 0)].astype(jnp.float32)
        from quiver_tpu.ops.distance import distance_pairs

        qb = jnp.broadcast_to(q[:, None, :], rows.shape).reshape(-1, D)
        dist = distance_pairs(qb, rows.reshape(-1, D), "euclidean").reshape(B, n_sur)
        dist = jnp.where(best_slot >= 0, dist, MASKED_DIST)
        neg_top, posn = jax.lax.top_k(-dist, k)
        return -neg_top[:, 0]  # stage 8: + exact rescore + final top-k

    for stage in range(1, 9):
        dt = timed(lambda s=stage: body(
            q, cents, cns, blocks, block_slot, rns, binv, bkeep,
            store_vectors, stage=s))
        print(f"stage {stage}: {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
