"""Tiled flat-scan top-k — the exact-search engine kernel.

TPU-native replacement for the reference's ``ExactIndex.Search`` scalar loop +
Go sort (reference: pkg/hybrid/exact.go:92-133) and for its filtered search
that retrieves searchK = Size() candidates then post-filters metadata JSON
(reference: pkg/core/collection.go:679-682, 704-753). Here the corpus streams
through the MXU one tile at a time under ``lax.scan``: each tile's distances
are computed as one matmul, validity/facet masks are fused in as +inf
distances, and a running top-k is re-reduced per tile — the [B, N] distance
matrix never materializes, so the scan works at any corpus size.

Also hosts the negative-example rerank pass (a second fused distance pass over
the candidate set — reference: pkg/hnsw/adapter.go:345-437,
pkg/hybrid/hybrid_index.go:516-570).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from quiver_tpu.ops.distance import (
    distance_pairs,
    inv_norms,
    norms_sq,
    pairwise_distance,
)
from quiver_tpu.types import DistanceType

#: Distance used for masked-out / invalid slots. Using a large finite value
#: instead of +inf keeps top_k comparisons well-defined in bf16/f32.
MASKED_DIST = jnp.float32(3.0e38)


def _merge_topk(best_dist, best_idx, tile_dist, tile_idx, k: int):
    """Merge a tile's distances into the running top-k (smallest-k)."""
    all_dist = jnp.concatenate([best_dist, tile_dist], axis=1)
    all_idx = jnp.concatenate([best_idx, tile_idx], axis=1)
    neg_top, pos = jax.lax.top_k(-all_dist, k)
    return -neg_top, jnp.take_along_axis(all_idx, pos, axis=1)


#: Score-matrix byte budget above which the scan switches from the
#: single-shot fused matmul+top-k to the tiled lax.scan formulation.
#: (Measured on TPU v5e: exact lax.top_k materializes full sort buffers —
#: B=4096 x 1M f32 wants 48 GB — so large B x cap must tile.)
SINGLE_SHOT_BUDGET_BYTES = 1 << 30


def _topk_smallest(dist, k: int, approx_recall: float | None):
    """Top-k smallest distances along axis 1.

    approx_recall=None -> exact lax.top_k (full sort on TPU — the oracle
    path). Otherwise lax.approx_max_k, the TPU-native partial-reduce from the
    TPU-KNN paper (PAPERS.md), with that recall target.
    """
    if approx_recall is None:
        neg, idx = jax.lax.top_k(-dist, k)
    else:
        neg, idx = jax.lax.approx_max_k(-dist, k, recall_target=approx_recall)
    return -neg, idx


def _topk_largest(score, k: int, approx_recall: float | None):
    if approx_recall is None:
        return jax.lax.top_k(score, k)
    return jax.lax.approx_max_k(score, k, recall_target=approx_recall)


NEG_BIG = jnp.float32(-3.0e38)


def _affine_scores(q, v, metric, v_norms_sq, v_inv_norms, compute_dtype,
                   precision=None):
    """Monotonic larger-is-better scores: ONE matmul + one fused affine.

    Ranking never needs the full distance — per-row constants (||q||, 1/||q||)
    and monotone transforms (sqrt, 1-x) are dropped, which removes billions of
    transcendental ops per scan; true distances are reconstructed for the k
    winners only (exact f32 rescore)."""
    dots = jnp.dot(
        q.astype(compute_dtype),
        v.astype(compute_dtype).T,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if metric == DistanceType.COSINE:
        return dots * v_inv_norms[None, :]  # q_inv > 0 is per-row constant
    if metric == DistanceType.DOT_PRODUCT:
        return dots
    # euclidean family: d^2 = ||q||^2 + ||v||^2 - 2 q.v  ->  2 q.v - ||v||^2
    return 2.0 * dots - v_norms_sq[None, :]


def _rescore_winners(q, vectors, idx, metric):
    """Exact f32 distances for the selected rows (tiny [B, k] gather)."""
    B, k = idx.shape
    rows = vectors[jnp.maximum(idx, 0)].astype(jnp.float32)  # [B, k, d]
    qb = jnp.broadcast_to(q[:, None, :], rows.shape).reshape(-1, q.shape[1])
    dist = distance_pairs(qb, rows.reshape(-1, q.shape[1]), metric)
    return dist.reshape(B, k)


@partial(
    jax.jit,
    static_argnames=(
        "metric", "k", "tile", "compute_dtype", "approx_recall", "precision",
    ),
)
def flat_scan_topk(
    q: jax.Array,
    vectors: jax.Array,
    valid: jax.Array,
    mask: jax.Array | None,
    v_norms_sq: jax.Array,
    v_inv_norms: jax.Array,
    *,
    metric: str,
    k: int,
    tile: int = 8192,
    compute_dtype=jnp.float32,
    approx_recall: float | None = None,
    precision: str | None = None,
):
    """Exact top-k scan.

    Args:
      q: f32[B, d] query block.
      vectors: [cap, d] corpus (cap is padded; invalid rows are masked).
      valid: bool[cap] slot-occupancy mask (deletes are cleared bits —
        the TPU analogue of the reference's tombstones, pkg/hnsw/hnsw.go:741).
      mask: optional bool[cap] or bool[B, cap] additional (facet) mask,
        fused into the scan — filtered search costs the same as unfiltered,
        unlike the reference's retrieve-all-then-post-filter.
      v_norms_sq / v_inv_norms: f32[cap] precomputed row stats.
      metric: static distance name.
      k: static result count.
      tile: static tile size; cap must be a multiple (store pads capacity).
      compute_dtype: jnp.float32 | jnp.bfloat16 matmul input dtype.
      precision: matmul precision ("highest" = true-f32 MXU passes for the
        guaranteed-exact contract; None = DEFAULT, which on TPU runs f32
        inputs as one bf16 pass — fine when ranking is allowed to be
        approximate). See ops/distance.pairwise_distance.

    Returns:
      (dist f32[B, k], idx i32[B, k]); empty slots have idx == -1 and
      dist == MASKED_DIST.
    """
    metric = DistanceType.parse(metric)
    B = q.shape[0]
    cap, d = vectors.shape
    if cap % tile != 0:
        # capacity follows the store's {2^k, 3*2^(k-1)} ladder; a pow2
        # tile request snaps down to gcd(cap, tile) — a pow2 within 2x of
        # the request for any ladder rung (tile is static, so this is
        # trace-time arithmetic, not device work)
        tile = math.gcd(cap, tile)
        if tile < 1:
            raise ValueError(f"capacity {cap} not tileable at {tile}")
    n_tiles = cap // tile
    k = min(k, cap)

    q = q.astype(jnp.float32)
    per_query_mask = mask is not None and mask.ndim == 2

    if metric != DistanceType.MANHATTAN and B * cap * 4 <= SINGLE_SHOT_BUDGET_BYTES:
        # Single-shot: one matmul + one fused affine score + top-k; true
        # distances reconstructed for the winners only.
        score = _affine_scores(
            q, vectors, metric, v_norms_sq, v_inv_norms, compute_dtype,
            precision,
        )
        keep = valid[None, :]
        if mask is not None:
            keep = keep & (mask if per_query_mask else mask[None, :])
        score = jnp.where(keep, score, NEG_BIG)
        best_score, best_idx = _topk_largest(score, k, approx_recall)
        found = best_score > NEG_BIG
        best_dist = _rescore_winners(q, vectors, best_idx, metric)
        # stable exact ordering of the winners by true distance
        best_dist = jnp.where(found, best_dist, MASKED_DIST)
        neg_top, pos = jax.lax.top_k(-best_dist, k)
        best_dist = -neg_top
        best_idx = jnp.take_along_axis(best_idx, pos, axis=1)
        return best_dist, jnp.where(best_dist >= MASKED_DIST, -1, best_idx)

    if B * cap * 4 <= SINGLE_SHOT_BUDGET_BYTES:
        # Manhattan: no matmul form — full distances single-shot
        dist = pairwise_distance(
            q,
            vectors,
            metric,
            v_norms_sq=v_norms_sq,
            v_inv_norms=v_inv_norms,
            compute_dtype=compute_dtype,
            precision=precision,
        )
        keep = valid[None, :]
        if mask is not None:
            keep = keep & (mask if per_query_mask else mask[None, :])
        dist = jnp.where(keep, dist, MASKED_DIST)
        best_dist, best_idx = _topk_smallest(dist, k, approx_recall)
        empty = best_dist >= MASKED_DIST
        return best_dist, jnp.where(empty, -1, best_idx)

    v_tiles = vectors.reshape(n_tiles, tile, d)
    valid_tiles = valid.reshape(n_tiles, tile)
    ns_tiles = v_norms_sq.reshape(n_tiles, tile)
    in_tiles = v_inv_norms.reshape(n_tiles, tile)
    if mask is None:
        mask_tiles = jnp.ones((n_tiles, 1), dtype=bool)  # dummy
    elif per_query_mask:
        mask_tiles = mask.reshape(B, n_tiles, tile).transpose(1, 0, 2)
    else:
        mask_tiles = mask.reshape(n_tiles, tile)

    init = (
        jnp.full((B, k), MASKED_DIST, jnp.float32),
        jnp.full((B, k), -1, jnp.int32),
    )
    use_affine = metric != DistanceType.MANHATTAN

    def body(carry, xs):
        i, v_t, valid_t, ns_t, in_t, m_t = xs
        best_key, best_idx = carry
        if use_affine:
            # larger-is-better affine score; carry merges on NEGATED score
            # so the generic smallest-k merge applies
            score = _affine_scores(
                q, v_t, metric, ns_t, in_t, compute_dtype, precision
            )
            key = -score
        else:
            key = pairwise_distance(
                q, v_t, metric, v_norms_sq=ns_t, v_inv_norms=in_t,
                compute_dtype=compute_dtype, precision=precision,
            )
        keep = valid_t[None, :]
        if mask is not None:
            keep = keep & (m_t if per_query_mask else m_t[None, :])
        key = jnp.where(keep, key, MASKED_DIST)
        # Reduce the tile to its own top-k first (bounds the merge sort to
        # [B, 2k] instead of [B, tile + k]).
        t_key, t_local = _topk_smallest(key, min(k, tile), approx_recall)
        t_idx = t_local.astype(jnp.int32) + i * tile
        return _merge_topk(best_key, best_idx, t_key, t_idx, k), None

    xs = (
        jnp.arange(n_tiles, dtype=jnp.int32),
        v_tiles,
        valid_tiles,
        ns_tiles,
        in_tiles,
        mask_tiles,
    )
    (best_key, best_idx), _ = jax.lax.scan(body, init, xs)
    empty = best_key >= MASKED_DIST
    best_idx = jnp.where(empty, -1, best_idx)
    if not use_affine:
        return best_key, best_idx
    # winners carry scores; reconstruct + exactly order true distances
    best_dist = _rescore_winners(q, vectors, best_idx, metric)
    best_dist = jnp.where(empty, MASKED_DIST, best_dist)
    neg_top, pos = jax.lax.top_k(-best_dist, k)
    best_dist = -neg_top
    best_idx = jnp.take_along_axis(best_idx, pos, axis=1)
    return best_dist, jnp.where(best_dist >= MASKED_DIST, -1, best_idx)


@partial(jax.jit, static_argnames=("metric", "k"))
def negative_rerank(
    cand_dist: jax.Array,
    cand_idx: jax.Array,
    vectors: jax.Array,
    negative: jax.Array,
    *,
    metric: str,
    k: int,
    weight: float | jax.Array = 0.5,
):
    """Rerank candidates away from a negative example.

    adjusted = d(query, v) - weight * d(negative, v); keep the k candidates
    with the smallest adjusted score, reporting their ORIGINAL query distance
    (reference formula: pkg/hnsw/adapter.go:417-421).

    Args:
      cand_dist: f32[B, R] original query distances (R = over-retrieved count,
        max(2k, 30) per reference adapter.go:353).
      cand_idx: i32[B, R] candidate slots, -1 for empty.
      vectors: [cap, d] corpus.
      negative: f32[B, d] negative example per query.
      metric / k / weight: rerank parameters.

    Returns:
      (dist f32[B, k], idx i32[B, k]) ordered by adjusted score.
    """
    metric = DistanceType.parse(metric)
    B, R = cand_dist.shape
    safe_idx = jnp.maximum(cand_idx, 0)
    cand_vecs = vectors[safe_idx].astype(jnp.float32)  # [B, R, d]
    neg = jnp.broadcast_to(
        negative.astype(jnp.float32)[:, None, :], cand_vecs.shape
    )
    d_neg = distance_pairs(
        cand_vecs.reshape(B * R, -1), neg.reshape(B * R, -1), metric
    ).reshape(B, R)
    adjusted = cand_dist - jnp.asarray(weight, jnp.float32) * d_neg
    adjusted = jnp.where(cand_idx >= 0, adjusted, MASKED_DIST)
    k = min(k, R)
    neg_top, pos = jax.lax.top_k(-adjusted, k)
    out_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    out_dist = jnp.take_along_axis(cand_dist, pos, axis=1)
    out_idx = jnp.where(-neg_top >= MASKED_DIST, -1, out_idx)
    out_dist = jnp.where(out_idx >= 0, out_dist, MASKED_DIST)
    return out_dist, out_idx


def compute_row_stats(vectors: jax.Array):
    """(norms_sq, inv_norms) for a corpus matrix — amortized once per write."""
    ns = norms_sq(vectors)
    return ns, inv_norms(ns)
