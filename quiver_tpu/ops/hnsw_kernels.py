"""Batched HNSW kernels: beam search + diversity neighbor selection.

TPU-native redesign of the reference's pointer-graph walk under mutexes
(reference: pkg/hnsw/hnsw.go:471-713, pkg/arrowindex/graph.go:537-654).
Queries are a leading batch dimension of ONE compiled program: each iteration
expands the nearest unexpanded beam entry of every query at once — a gather of
neighbor rows, a fused batched distance, and a masked top-ef merge — inside
``lax.while_loop`` with static bounds (no data-dependent Python control flow).

Visited tracking: the reference's epoch-stamped VisitedList
(pkg/arrowindex/graph.go:16-109) becomes (a) beam-membership tests plus (b) a
per-query rolling ring of recently-visited ids — O(ef) VMEM state instead of
an O(N) map, the standard accelerator-ANN trade (a node evicted from the beam
can be re-expanded in pathological cases; the iteration cap bounds the cost).

The neighbor-selection heuristic is the hnswlib-style occlusion rule the
reference implements scalar-ly in selectNeighborsHeuristic
(pkg/arrowindex/graph.go:953-984): candidate c is rejected when it is closer
to an already-selected neighbor than to the query. Here it runs as a
vectorized lax.scan over candidate rank for a whole batch of nodes at once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from quiver_tpu.ops.distance import pairwise_distance
from quiver_tpu.ops.scan import MASKED_DIST
from quiver_tpu.types import DistanceType


def _batched_distance(q, vecs, metric, compute_dtype):
    """q f32[B, d] vs vecs f32[B, K, d] -> f32[B, K] (one fused vmapped call)."""
    return jax.vmap(
        lambda qq, vv: pairwise_distance(
            qq[None, :], vv, metric, compute_dtype=compute_dtype
        )[0]
    )(q, vecs)


@partial(
    jax.jit,
    static_argnames=("metric", "ef", "max_iters", "compute_dtype"),
)
def beam_search(
    queries: jax.Array,  # f32[B, d]
    entries: jax.Array,  # i32[B] start nodes (global slots)
    vectors: jax.Array,  # f32[cap, d]
    valid: jax.Array,  # bool[cap] live-slot mask
    adj: jax.Array,  # i32[rows, deg] adjacency (global slot ids, -1 pad)
    pos_map: jax.Array,  # i32[cap] global slot -> adj row (-1 absent)
    *,
    metric: str,
    ef: int,
    max_iters: int,
    compute_dtype=jnp.float32,
):
    """Batched best-first beam search over one graph layer.

    Returns (dist f32[B, ef], ids i32[B, ef]) sorted ascending by distance;
    empty slots have id -1 / dist MASKED_DIST. Generic over layers: pass the
    layer's adjacency + its global->row map (identity for layer 0).
    """
    metric = DistanceType.parse(metric)
    B, d = queries.shape
    deg = adj.shape[1]
    ring_len = max(2 * ef, 128)

    # --- initial beam: the entry points
    e_valid = (entries >= 0) & valid[jnp.maximum(entries, 0)]
    e_vecs = vectors[jnp.maximum(entries, 0)]
    e_dist = _batched_distance(queries, e_vecs[:, None, :], metric, compute_dtype)[:, 0]
    e_dist = jnp.where(e_valid, e_dist, MASKED_DIST)

    beam_dist = jnp.full((B, ef), MASKED_DIST, jnp.float32).at[:, 0].set(e_dist)
    beam_ids = jnp.full((B, ef), -1, jnp.int32).at[:, 0].set(
        jnp.where(e_valid, entries, -1)
    )
    beam_exp = jnp.zeros((B, ef), bool)
    ring = jnp.full((B, ring_len), -1, jnp.int32).at[:, :1].set(beam_ids[:, :1])

    def cond(state):
        i, _bd, bi, bexp, _ring, done = state
        return (i < max_iters) & ~jnp.all(done)

    def body(state):
        i, bd, bi, bexp, ring, done = state
        # 1. nearest unexpanded beam entry per query
        cand_d = jnp.where(bexp | (bi < 0), MASKED_DIST, bd)
        pos = jnp.argmin(cand_d, axis=1)  # [B]
        cur = jnp.take_along_axis(bi, pos[:, None], axis=1)[:, 0]  # [B]
        cur_d = jnp.take_along_axis(cand_d, pos[:, None], axis=1)[:, 0]
        has_work = (cur >= 0) & (cur_d < MASKED_DIST)
        # classic termination: nearest unexpanded is worse than the beam's
        # worst filled entry (hnsw.go:508-514)
        worst = jnp.max(jnp.where(bi >= 0, bd, -MASKED_DIST), axis=1)
        beam_full = jnp.sum(bi >= 0, axis=1) >= ef
        newly_done = ~has_work | (beam_full & (cur_d > worst))
        done = done | newly_done
        active = ~done

        # 2. mark expanded
        bexp = bexp | (
            jax.nn.one_hot(pos, ef, dtype=bool) & active[:, None] & (bi >= 0)
        )

        # 3. gather neighbor rows
        row = pos_map[jnp.maximum(cur, 0)]  # [B]
        nbrs = adj[jnp.maximum(row, 0)]  # [B, deg]
        nbrs = jnp.where(((row >= 0) & active)[:, None], nbrs, -1)

        ok = (nbrs >= 0) & valid[jnp.maximum(nbrs, 0)]
        # 4. dedup: drop anything already in the beam or recently visited
        in_beam = jnp.any(nbrs[:, :, None] == bi[:, None, :], axis=2)
        in_ring = jnp.any(nbrs[:, :, None] == ring[:, None, :], axis=2)
        ok = ok & ~in_beam & ~in_ring

        # 5. record in the visited ring (rolling window)
        offset = (i * deg) % ring_len
        ring = jax.lax.dynamic_update_slice(
            ring, jnp.where(ok, nbrs, -1), (0, offset)
        )

        # 6. batched distances to the gathered neighbors
        n_vecs = vectors[jnp.maximum(nbrs, 0)]  # [B, deg, d]
        n_dist = _batched_distance(queries, n_vecs, metric, compute_dtype)
        n_dist = jnp.where(ok, n_dist, MASKED_DIST)

        # 7. merge into the beam: keep smallest ef of (beam + neighbors)
        all_d = jnp.concatenate([bd, n_dist], axis=1)
        all_i = jnp.concatenate([bi, nbrs], axis=1)
        all_e = jnp.concatenate([bexp, jnp.zeros_like(ok)], axis=1)
        neg_top, sel = jax.lax.top_k(-all_d, ef)
        bd = -neg_top
        bi = jnp.take_along_axis(all_i, sel, axis=1)
        bexp = jnp.take_along_axis(all_e, sel, axis=1)
        bi = jnp.where(bd >= MASKED_DIST, -1, bi)
        return (i + 1, bd, bi, bexp, ring, done)

    init = (jnp.int32(0), beam_dist, beam_ids, beam_exp, ring,
            jnp.zeros((B,), bool))
    _, bd, bi, _, _, _ = jax.lax.while_loop(cond, body, init)
    return bd, bi


@partial(jax.jit, static_argnames=("metric", "max_iters", "compute_dtype"))
def greedy_descent(
    queries: jax.Array,  # f32[B, d]
    entries: jax.Array,  # i32[B]
    vectors: jax.Array,
    valid: jax.Array,
    adj: jax.Array,  # i32[rows, deg] layer adjacency
    pos_map: jax.Array,  # i32[cap]
    *,
    metric: str,
    max_iters: int = 32,
    compute_dtype=jnp.float32,
):
    """Batched ef=1 greedy walk on one upper layer (reference greedy descent,
    hnsw.go:649-657). Returns (dist f32[B], ids i32[B]) of the local minimum."""
    metric = DistanceType.parse(metric)

    e_ok = (entries >= 0) & valid[jnp.maximum(entries, 0)]
    e_vecs = vectors[jnp.maximum(entries, 0)]
    e_dist = _batched_distance(queries, e_vecs[:, None, :], metric, compute_dtype)[:, 0]
    e_dist = jnp.where(e_ok, e_dist, MASKED_DIST)

    def cond(state):
        i, _cd, _ci, moved = state
        return (i < max_iters) & jnp.any(moved)

    def body(state):
        i, cd, ci, moved = state
        row = pos_map[jnp.maximum(ci, 0)]
        nbrs = adj[jnp.maximum(row, 0)]
        ok = (row >= 0)[:, None] & (nbrs >= 0) & valid[jnp.maximum(nbrs, 0)] & moved[:, None]
        n_vecs = vectors[jnp.maximum(nbrs, 0)]
        n_dist = _batched_distance(queries, n_vecs, metric, compute_dtype)
        n_dist = jnp.where(ok, n_dist, MASKED_DIST)
        best = jnp.argmin(n_dist, axis=1)
        best_d = jnp.take_along_axis(n_dist, best[:, None], axis=1)[:, 0]
        best_i = jnp.take_along_axis(nbrs, best[:, None], axis=1)[:, 0]
        improved = best_d < cd
        cd = jnp.where(improved, best_d, cd)
        ci = jnp.where(improved, best_i, ci)
        return (i + 1, cd, ci, improved)

    init = (jnp.int32(0), e_dist, jnp.where(e_ok, entries, -1),
            jnp.ones(queries.shape[0], bool))
    _, cd, ci, _ = jax.lax.while_loop(cond, body, init)
    return cd, ci


@partial(jax.jit, static_argnames=("metric", "m", "compute_dtype"))
def select_neighbors(
    query_vecs: jax.Array,  # f32[B, d] the points being connected
    cand_ids: jax.Array,  # i32[B, C] candidates (-1 pad)
    cand_dist: jax.Array,  # f32[B, C] distance(query, candidate)
    vectors: jax.Array,  # f32[cap, d]
    *,
    metric: str,
    m: int,
    compute_dtype=jnp.float32,
):
    """Batched hnswlib diversity heuristic (reference
    selectNeighborsHeuristic, pkg/arrowindex/graph.go:953-984 — kept over
    pkg/hnsw's plain sort-truncate per SURVEY.md §7).

    Greedy over candidates in ascending distance order: accept c unless some
    already-accepted s has d(c, s) < d(c, query). Returns
    (ids i32[B, m], dist f32[B, m]) with -1 padding.

    Cost: one [B, C, C] batched pairwise-distance (MXU) + a C-step lax.scan.
    """
    metric = DistanceType.parse(metric)
    B, C = cand_ids.shape

    ok = cand_ids >= 0
    # sort candidates by distance ascending (stable on padded entries)
    sort_d = jnp.where(ok, cand_dist, MASKED_DIST)
    neg_top, order = jax.lax.top_k(-sort_d, C)
    cand_dist = -neg_top
    cand_ids = jnp.take_along_axis(cand_ids, order, axis=1)
    ok = cand_ids >= 0

    c_vecs = vectors[jnp.maximum(cand_ids, 0)]  # [B, C, d]
    # pairwise distances among candidates
    pair = jax.vmap(
        lambda v: pairwise_distance(v, v, metric, compute_dtype=compute_dtype)
    )(c_vecs)  # [B, C, C]
    pair = jnp.where(ok[:, :, None] & ok[:, None, :], pair, MASKED_DIST)

    def step(carry, j):
        sel_mask, count = carry
        d_qj = cand_dist[:, j]  # [B]
        # occluded: exists selected s with d(c_j, s) < d(c_j, q)
        occ = jnp.any(sel_mask & (pair[:, j, :] < d_qj[:, None]), axis=1)
        accept = ok[:, j] & ~occ & (count < m) & (d_qj < MASKED_DIST)
        sel_mask = sel_mask.at[:, j].set(accept)
        return (sel_mask, count + accept.astype(jnp.int32)), None

    (sel_mask, _), _ = jax.lax.scan(
        step, (jnp.zeros((B, C), bool), jnp.zeros(B, jnp.int32)),
        jnp.arange(C),
    )

    # compact: selected first (ascending distance), -1 pad; always m columns
    sel_d = jnp.where(sel_mask, cand_dist, MASKED_DIST)
    kk = min(m, C)
    neg_top, sel_order = jax.lax.top_k(-sel_d, kk)
    out_d = -neg_top
    out_i = jnp.take_along_axis(cand_ids, sel_order, axis=1)
    out_i = jnp.where(out_d >= MASKED_DIST, -1, out_i)
    if kk < m:
        pad = m - kk
        out_d = jnp.pad(out_d, ((0, 0), (0, pad)), constant_values=MASKED_DIST)
        out_i = jnp.pad(out_i, ((0, 0), (0, pad)), constant_values=-1)
    return out_i, out_d
