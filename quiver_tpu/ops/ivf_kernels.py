"""IVF (inverted-file) kernels: k-means training + pruned batched query.

The profile of the fused flat scan (benches/profile_scan2.py) shows the
1M-row scan is bound by the fused matmul+top-k reduce (~4.8 ms at B=2048),
not by MXU flops or dtype — so the only way to a large speedup is to score
FEWER rows. IVF is the classic pruning structure, re-designed TPU-first:

* the corpus is partitioned by k-means into K clusters and laid out as one
  dense padded block tensor ``[K, Cmax, d]`` — every cluster the same
  static width, so the whole probe phase is ONE batched matmul on the MXU
  (no ragged gathers, no dynamic shapes);
* a query batch probes its top-P clusters; the (query, probe) pairs are
  grouped BY CLUSTER on device with static-shaped sort/scan primitives, so
  each cluster block is read once per batch and multiplied against the
  queries probing it (``einsum('kbd,kcd->kbc')``) instead of once per query;
* per-(cluster, query) top-k candidates scatter back to their queries and
  merge; winners are exactly rescored in f32 against the store matrix.

The reference has no ANN structure beyond HNSW; this engine exists because
on TPU a block-pruned matmul beats pointer-chasing by orders of magnitude
(SURVEY.md §7 north star). Deletes need no index maintenance: validity is
a query-time mask over the store's slot bitmap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from quiver_tpu.ops.scan import MASKED_DIST, NEG_BIG
from quiver_tpu.types import DistanceType


def _affine_block_scores(dots, norms_sq, inv_norms, metric):
    """Monotone larger-is-better scores from raw dot products (same affine
    trick as ops/scan._affine_scores: drop per-query constants)."""
    if metric == DistanceType.COSINE:
        return dots * inv_norms
    if metric == DistanceType.DOT_PRODUCT:
        return dots
    return 2.0 * dots - norms_sq  # euclidean family


# --------------------------------------------------------------------- train


@partial(jax.jit, static_argnames=("n_iters",), donate_argnums=(1,))
def _lloyd_iters(x, centroids, valid, n_iters: int):
    """Lloyd's k-means on device: assignment via row-blocked matmul argmax
    (the [N, K] score matrix would be N*K*4 bytes — 16 GB at 1M x 4096 —
    so blocks keep peak HBM bounded and let XLA fuse the argmax into each
    block's matmul), update via segment-sum. Invalid rows never contribute.
    Empty clusters keep their previous centroid (host fixes them up)."""
    n, d = x.shape
    k = centroids.shape[0]
    ones = jnp.where(valid, 1.0, 0.0)
    # row block: <= 256 MB of scores
    bs = max(1, min(n, (1 << 26) // max(k, 1)))
    while n % bs != 0:  # n is pow2-padded by the store; keep bs a divisor
        bs //= 2
    xb = x.reshape(n // bs, bs, d)

    def assign_all(c):
        c_ns = jnp.sum(c * c, axis=1)

        def block(xx):
            return jnp.argmax(2.0 * (xx @ c.T) - c_ns[None, :], axis=1)

        return jax.lax.map(block, xb).reshape(n)

    def step(c, _):
        assign = jnp.where(valid, assign_all(c), k)  # park invalid rows
        sums = jax.ops.segment_sum(x * ones[:, None], assign, num_segments=k + 1)[:k]
        counts = jax.ops.segment_sum(ones, assign, num_segments=k + 1)[:k]
        new_c = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), c)
        return new_c, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=n_iters)
    assign = assign_all(centroids)
    return centroids, jnp.where(valid, assign, -1)


def train_kmeans(
    vectors: np.ndarray,
    valid: np.ndarray,
    k: int,
    *,
    n_iters: int = 10,
    seed: int = 0,
):
    """K-means over the live rows. Returns (centroids f32[k, d],
    assign i32[n] with -1 for invalid rows). Runs Lloyd on device; empty
    clusters are re-seeded from random live rows on host (rare)."""
    rng = np.random.default_rng(seed)
    live = np.flatnonzero(valid)
    if len(live) < k:
        raise ValueError(f"need at least k={k} live rows, have {len(live)}")
    init = vectors[rng.choice(live, size=k, replace=False)].astype(np.float32)
    cents, assign = _lloyd_iters(
        jnp.asarray(vectors, jnp.float32), jnp.asarray(init),
        jnp.asarray(valid, bool), n_iters,
    )
    cents = np.array(cents)  # writable copies (jax arrays view read-only)
    assign = np.array(assign)
    # fix empty clusters: seed from random live rows, steal their membership
    counts = np.bincount(assign[assign >= 0], minlength=k)
    empty = np.flatnonzero(counts == 0)
    if len(empty):
        steal = rng.choice(live, size=len(empty), replace=False)
        cents[empty] = vectors[steal]
        assign[steal] = empty
    return cents, assign


def balance_assignment(
    assign: np.ndarray,
    scores_fn,
    cmax: int,
    k: int,
):
    """Cap every cluster at ``cmax`` rows: overflow rows (farthest first)
    re-assign to their best cluster with room. Host-side, runs once per
    (re)build. ``scores_fn(rows) -> [m, k]`` larger-is-better scores."""
    counts = np.bincount(assign[assign >= 0], minlength=k)
    over = [c for c in range(k) if counts[c] > cmax]
    if not over:
        return assign
    assign = assign.copy()
    for c in over:
        rows = np.flatnonzero(assign == c)
        s = scores_fn(rows)[:, c]
        keep = rows[np.argsort(-s)[:cmax]]
        spill = np.setdiff1d(rows, keep, assume_unique=False)
        assign[spill] = -2  # pending
    pend = np.flatnonzero(assign == -2)
    if len(pend):
        s = scores_fn(pend)  # [m, k]
        pref = np.argsort(-s, axis=1)
        room = cmax - np.bincount(assign[assign >= 0], minlength=k)
        for i, row in enumerate(pend):
            for c in pref[i]:
                if room[c] > 0:
                    assign[row] = c
                    room[c] -= 1
                    break
            else:  # pragma: no cover - only if total capacity < live rows
                raise RuntimeError("IVF balance: no cluster has room")
    return assign


# --------------------------------------------------------------------- query


@partial(
    jax.jit,
    static_argnames=(
        "metric", "k", "n_probe", "b_max", "compute_dtype", "oversample",
    ),
)
def ivf_query(
    q: jax.Array,  # f32[B, d]
    centroids: jax.Array,  # f32[K, d]
    cent_norms_sq: jax.Array,  # f32[K]
    blocks: jax.Array,  # [K, Cmax, d] cluster-blocked corpus (compute dtype)
    block_slot: jax.Array,  # i32[K, Cmax] global store slot (-1 pad)
    block_norms_sq: jax.Array,  # f32[K, Cmax]
    block_inv_norms: jax.Array,  # f32[K, Cmax]
    slot_keep: jax.Array,  # bool[cap] valid & facet mask by global slot
    store_vectors: jax.Array,  # f32[cap, d] for the exact rescore
    *,
    metric: str,
    k: int,
    n_probe: int,
    b_max: int,
    compute_dtype=jnp.bfloat16,
    oversample: int = 3,
):
    """Pruned batched search. Returns (dist f32[B, k], slot i32[B, k]) with
    exact f32 distances, -1 for empty.

    ``oversample``: survivors kept through the low-precision ranking stage,
    as a multiple of k. bf16 affine scores carry ~|q||v|*2^-8 absolute
    noise — comparable to true in-cluster distance gaps — so the bf16
    stage must over-retrieve and let the exact f32 rescore restore the
    order (measured: 0.91 -> 1.0 recall@10 on clustered data)."""
    metric = DistanceType.parse(metric)
    B, d = q.shape
    K, Cmax, _ = blocks.shape
    P = min(n_probe, K)

    # ---- 1. probe selection: affine centroid scores, top-P per query
    c_dots = q @ centroids.T
    if metric == DistanceType.COSINE:
        c_scores = c_dots * jax.lax.rsqrt(
            jnp.maximum(cent_norms_sq, 1e-30)
        )[None, :]
    elif metric == DistanceType.DOT_PRODUCT:
        c_scores = c_dots
    else:  # euclidean family
        c_scores = 2.0 * c_dots - cent_norms_sq[None, :]
    _, probe = jax.lax.top_k(c_scores, P)  # i32[B, P]

    # ---- 2. group (query, probe) pairs by cluster with static shapes.
    # A cluster probed by more than b_max queries splits into several
    # GROUPS of b_max (its block is re-gathered per group), so no pair is
    # ever dropped — correlated query batches hammer the same few clusters
    # and a capped per-cluster rank budget would silently cap recall.
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
    rank = pos - start_pos  # rank of the pair within its cluster
    col = rank % b_max
    group_id = jnp.cumsum((col == 0).astype(jnp.int32)) - 1
    # every group is one cluster; ≤ min(K,BP) cluster-starts + BP/b_max splits
    G = min(K, BP) + BP // b_max

    qlist = jnp.full((G, b_max), -1, jnp.int32).at[group_id, col].set(b_of)
    gcluster = jnp.zeros((G,), jnp.int32).at[group_id].set(sorted_c)

    # ---- 3. per-group block matmul against its probing queries
    qg = q[jnp.maximum(qlist, 0)].astype(compute_dtype)  # [G, b_max, d]
    blk_g = blocks[gcluster]  # [G, Cmax, d] (hot blocks replicate)
    slot_g = block_slot[gcluster]  # [G, Cmax]
    dots = jnp.einsum(
        "gbd,gcd->gbc", qg, blk_g.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    scores = _affine_block_scores(
        dots,
        block_norms_sq[gcluster][:, None, :],
        block_inv_norms[gcluster][:, None, :],
        metric,
    )
    ok = (
        (qlist[:, :, None] >= 0)
        & (slot_g[:, None, :] >= 0)
        & slot_keep[jnp.maximum(slot_g, 0)][:, None, :]
    )
    scores = jnp.where(ok, scores, NEG_BIG)

    # ---- 4. per-(group, query) top-k (oversampled for the f32 rescore)
    kk = min(k * oversample, Cmax)
    top_s, top_c = jax.lax.top_k(scores, kk)  # [G, b_max, kk]
    top_slot = jnp.take_along_axis(
        jnp.broadcast_to(slot_g[:, None, :], scores.shape), top_c, axis=2
    )

    # ---- 5. scatter candidates back to their queries and merge
    pair_s = top_s[group_id, col]  # [BP, kk]
    pair_slot = top_slot[group_id, col]
    cand_s = jnp.zeros((B, P, kk), jnp.float32).at[b_of, order % P].set(pair_s)
    cand_slot = jnp.full((B, P, kk), -1, jnp.int32).at[b_of, order % P].set(pair_slot)
    cand_s = cand_s.reshape(B, P * kk)
    cand_slot = cand_slot.reshape(B, P * kk)
    # keep an oversampled survivor set into the rescore (bf16 stage noise);
    # a slot can appear once per probe pair at most once — pairs partition
    # the clusters, and a slot lives in exactly one cluster block
    n_sur = min(k * oversample, P * kk)
    best_s, sel = jax.lax.top_k(cand_s, n_sur)
    best_slot = jnp.take_along_axis(cand_slot, sel, axis=1)
    best_slot = jnp.where(best_s > NEG_BIG, best_slot, -1)

    # ---- 6. exact f32 rescore of the survivors + final top-k
    rows = store_vectors[jnp.maximum(best_slot, 0)].astype(jnp.float32)
    from quiver_tpu.ops.distance import distance_pairs

    qb = jnp.broadcast_to(q[:, None, :], rows.shape).reshape(-1, d)
    dist = distance_pairs(qb, rows.reshape(-1, d), metric).reshape(B, n_sur)
    dist = jnp.where(best_slot >= 0, dist, MASKED_DIST)
    k_out = min(k, n_sur)
    neg_top, posn = jax.lax.top_k(-dist, k_out)
    dist = -neg_top
    best_slot = jnp.take_along_axis(best_slot, posn, axis=1)
    best_slot = jnp.where(dist >= MASKED_DIST, -1, best_slot)
    if k_out < k:
        pad = k - k_out
        dist = jnp.pad(dist, ((0, 0), (0, pad)), constant_values=MASKED_DIST)
        best_slot = jnp.pad(best_slot, ((0, 0), (0, pad)), constant_values=-1)
    return dist, best_slot
