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


def _compare_exchange(vals, stride: int):
    """One bitonic stage: compare-exchange pairs at distance ``stride`` along
    axis 1 for every array in ``vals`` (keys first). Pure VPU min/max/where —
    no sort custom call (lax.top_k lowers to a full variadic sort on TPU,
    which dominated the beam loop)."""
    d = vals[0]
    B, L = d.shape
    shaped = [v.reshape(B, L // (2 * stride), 2, stride) for v in vals]
    first_le = shaped[0][:, :, 0, :] <= shaped[0][:, :, 1, :]
    out = []
    for v in shaped:
        lo = jnp.where(first_le, v[:, :, 0, :], v[:, :, 1, :])
        hi = jnp.where(first_le, v[:, :, 1, :], v[:, :, 0, :])
        out.append(jnp.stack([lo, hi], axis=2).reshape(B, L))
    return out


def bitonic_merge(a, b):
    """Merge two ascending-sorted tuples (keys, *payloads) along axis 1.
    a: [B, n], b: [B, m]; n + m must be a power of two. Returns ascending
    [B, n+m] tuples. O(log(n+m)) VPU stages."""
    # ascending ++ reversed(descending) is a bitonic sequence
    vals = [
        jnp.concatenate([va, vb[:, ::-1]], axis=1) for va, vb in zip(a, b)
    ]
    L = vals[0].shape[1]
    stride = L // 2
    while stride >= 1:
        vals = _compare_exchange(vals, stride)
        stride //= 2
    return vals


def bitonic_sort(vals):
    """Full ascending sort of (keys, *payloads) along axis 1; width must be a
    power of two. Merge-sort built on ``bitonic_merge`` — O(log^2 w) VPU
    stages; for the small candidate blocks (deg <= 64) this beats the sort
    custom call by a wide margin."""
    B, L = vals[0].shape
    w = 1
    while w < L:
        # merge adjacent sorted runs of width w pairwise
        a = [v.reshape(B, L // w, w)[:, 0::2, :].reshape(-1, w) for v in vals]
        b = [v.reshape(B, L // w, w)[:, 1::2, :].reshape(-1, w) for v in vals]
        merged = bitonic_merge(a, b)
        vals = [
            m.reshape(B, L // (2 * w), 2 * w).reshape(B, L) for m in merged
        ]
        w *= 2
    return vals


@partial(
    jax.jit,
    static_argnames=(
        "metric", "ef", "max_iters", "compute_dtype", "expand", "visited",
    ),
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
    expand: int = 4,
    visited: str = "ring",
):
    """Batched best-first beam search over one graph layer.

    ``expand`` nearest unexpanded beam entries are expanded per iteration —
    the serial gather->distance->merge dependency chain is the latency
    bottleneck on TPU, so widening each step cuts the chain length ~expand x
    for the same total distance evaluations (a standard accelerator-ANN
    generalization of best-first search).

    ``visited`` selects the visited-set structure:

    * ``"ring"`` — O(ef) VMEM rolling window of recent ids (default; a node
      evicted from both beam and ring can re-expand in pathological graphs);
    * ``"bitmap"`` — a true O(N) per-query bitset ``u32[B, cap/32]``, the
      exact semantics of the reference's epoch-stamped VisitedList
      (pkg/arrowindex/graph.go:16-109) at ~cap/8 bytes per query of HBM.
      Discovery marks the bit, so re-expansion is impossible.

    Returns (dist f32[B, ef], ids i32[B, ef]) sorted ascending by distance;
    empty slots have id -1 / dist MASKED_DIST. Generic over layers: pass the
    layer's adjacency + its global->row map (identity for layer 0).
    """
    metric = DistanceType.parse(metric)
    B, d = queries.shape
    cap = vectors.shape[0]
    deg = adj.shape[1]
    # candidate block per iteration, padded to a power of two: the merge
    # is a bitonic network, which only sorts pow2 widths — a non-pow2
    # degree (m0=48 is a legitimate 2x-m setting) must pad, not crash
    block = deg * expand
    while block & (block - 1):
        block += 1
    pad_cols = block - deg * expand
    use_bitmap = visited == "bitmap"
    # the ring must be a multiple of the per-iteration block:
    # dynamic_update_slice CLAMPS start indices, so a non-aligned offset
    # would pin late writes to the tail (part of the ring never written,
    # colliding offsets expiring entries early)
    ring_len = -(-max(2 * ef, 128) // block) * block
    total = 1
    while total < ef + block:
        total *= 2
    beam_len = total - block

    # --- initial beam: the entry points (sorted: one entry + MASKED fill)
    e_valid = (entries >= 0) & valid[jnp.maximum(entries, 0)]
    e_vecs = vectors[jnp.maximum(entries, 0)]
    e_dist = _batched_distance(queries, e_vecs[:, None, :], metric, compute_dtype)[:, 0]
    e_dist = jnp.where(e_valid, e_dist, MASKED_DIST)

    beam_dist = jnp.full((B, beam_len), MASKED_DIST, jnp.float32).at[:, 0].set(e_dist)
    beam_ids = jnp.full((B, beam_len), -1, jnp.int32).at[:, 0].set(
        jnp.where(e_valid, entries, -1)
    )
    beam_exp = jnp.zeros((B, beam_len), bool)
    if use_bitmap:
        words = ((cap + 31) // 32 + 127) // 128 * 128  # lane-aligned
        e_word = jnp.maximum(beam_ids[:, 0], 0) >> 5
        e_bit = jnp.where(
            beam_ids[:, 0] >= 0,
            jnp.uint32(1) << (jnp.maximum(beam_ids[:, 0], 0) & 31).astype(jnp.uint32),
            jnp.uint32(0),
        )
        ring = (
            jnp.zeros((B, words), jnp.uint32)
            .at[jnp.arange(B), e_word]
            .add(e_bit)
        )
    else:
        ring = jnp.full((B, ring_len), -1, jnp.int32).at[:, :1].set(
            beam_ids[:, :1]
        )

    def cond(state):
        i, _bd, bi, bexp, _ring, done = state
        return (i < max_iters) & ~jnp.all(done)

    def body(state):
        i, bd, bi, bexp, ring, done = state
        # 1. nearest unexpanded beam entry per query
        # 1. the `expand` nearest unexpanded beam entries per query. The beam
        # is sorted ascending, so these are the first `expand` unexpanded
        # positions — selected branch-free via a running rank over ~bexp.
        unexp = ~bexp & (bi >= 0)
        rank = jnp.cumsum(unexp.astype(jnp.int32), axis=1) - 1  # rank among unexpanded
        sel = unexp & (rank < expand)  # [B, beam_len] first `expand` unexpanded
        cur_d0 = jnp.min(
            jnp.where(unexp, bd, MASKED_DIST), axis=1
        )  # nearest unexpanded distance
        has_work = cur_d0 < MASKED_DIST
        # classic termination: nearest unexpanded is worse than the worst of
        # the TOP-ef beam entries (hnsw.go:508-514). The beam is sorted
        # ascending, so that's simply column ef-1 — using the whole padded
        # beam here made ef=50 and ef=100 searches identical (beam_len
        # quantizes to the same pow2), flattening the recall-vs-ef curve.
        kk_t = min(ef, beam_len)
        worst = bd[:, kk_t - 1]
        beam_full = bi[:, kk_t - 1] >= 0
        newly_done = ~has_work | (beam_full & (cur_d0 > worst))
        done = done | newly_done
        active = ~done

        # 2. mark them expanded; extract their ids into a dense [B, expand]
        bexp = bexp | (sel & active[:, None])
        # dense extraction: exactly one position holds rank j (or none)
        sel_rank = jnp.where(sel, rank, -1)
        curs = jnp.stack(
            [
                jnp.max(jnp.where(sel_rank == j, bi, -1), axis=1)
                for j in range(expand)
            ],
            axis=1,
        )  # [B, expand], -1 where fewer than j unexpanded remain

        # 3. gather neighbor rows for all expanded entries
        rows = pos_map[jnp.maximum(curs, 0)]  # [B, expand]
        rows_ok = (curs >= 0) & (rows >= 0) & active[:, None]
        nbrs = adj[jnp.maximum(rows, 0)]  # [B, expand, deg]
        nbrs = jnp.where(rows_ok[:, :, None], nbrs, -1).reshape(
            B, deg * expand
        )
        if pad_cols:
            nbrs = jnp.concatenate(
                [nbrs, jnp.full((B, pad_cols), -1, jnp.int32)], axis=1
            )

        ok = (nbrs >= 0) & valid[jnp.maximum(nbrs, 0)]
        # 4. dedup: drop duplicates within the block (expanded nodes share
        # neighbors), then anything already visited
        eq = nbrs[:, :, None] == nbrs[:, None, :]
        col = jax.lax.broadcasted_iota(jnp.int32, eq.shape, 2)
        row_i = jax.lax.broadcasted_iota(jnp.int32, eq.shape, 1)
        dup = jnp.any(eq & (col < row_i), axis=2)
        if use_bitmap:
            # true visited bitset: test the bit, then set it. Discovery
            # marks the bit, so beam membership is subsumed. The scatter
            # uses .add, which equals OR because ~seen & ~dup guarantees
            # each added bit is currently clear and added once.
            w_idx = jnp.maximum(nbrs, 0) >> 5
            bit = jnp.uint32(1) << (jnp.maximum(nbrs, 0) & 31).astype(jnp.uint32)
            words = jnp.take_along_axis(ring, w_idx, axis=1)
            seen = (words & bit) != 0
            ok = ok & ~dup & ~seen
            ring = ring.at[
                jnp.arange(B)[:, None], w_idx
            ].add(jnp.where(ok, bit, jnp.uint32(0)))
        else:
            in_beam = jnp.any(nbrs[:, :, None] == bi[:, None, :], axis=2)
            in_ring = jnp.any(nbrs[:, :, None] == ring[:, None, :], axis=2)
            ok = ok & ~dup & ~in_beam & ~in_ring

            # 5. record in the visited ring (rolling window)
            offset = (i * block) % ring_len
            ring = jax.lax.dynamic_update_slice(
                ring, jnp.where(ok, nbrs, -1), (0, offset)
            )

        # 6. batched distances to the gathered neighbors
        n_vecs = vectors[jnp.maximum(nbrs, 0)]  # [B, block, d]
        n_dist = _batched_distance(queries, n_vecs, metric, compute_dtype)
        n_dist = jnp.where(ok, n_dist, MASKED_DIST)

        # 7. merge into the beam via the bitonic network (sorted invariant):
        # sort the candidate block, merge with the sorted beam, truncate
        cd, ci, ce = bitonic_sort([n_dist, nbrs, jnp.zeros_like(ok)])
        md, mi, me = bitonic_merge([bd, bi, bexp], [cd, ci, ce])
        bd = md[:, :beam_len]
        bi = jnp.where(bd >= MASKED_DIST, -1, mi[:, :beam_len])
        bexp = me[:, :beam_len]
        return (i + 1, bd, bi, bexp, ring, done)

    init = (jnp.int32(0), beam_dist, beam_ids, beam_exp, ring,
            jnp.zeros((B,), bool))
    _, bd, bi, _, _, _ = jax.lax.while_loop(cond, body, init)
    return bd[:, :ef], bi[:, :ef]


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


def connect_level(
    adj: jax.Array,  # i32[rows, deg] layer adjacency
    fill: jax.Array,  # i32[rows] live-edge counts
    pos_map: jax.Array,  # i32[cap]
    vectors: jax.Array,  # f32[cap, d]
    slots: jax.Array,  # i32[B] new node slots (-1 pad)
    connect: jax.Array,  # bool[B] node connects at this level
    sel: jax.Array,  # i32[B, deg] selected forward neighbors (-1 pad)
    *,
    metric: str,
    u_budget: int,
    e_budget: int,
    compute_dtype=jnp.float32,
    keep_pruned: bool = True,
):
    """Device-side level connect: forward rows + bidirectional reverse
    edges + overflow re-selection — the whole mutation of one layer for one
    insert batch, traceable inside a single fused build program (the host
    round-trips this replaces were the build-throughput ceiling on
    remote-dispatch links; reference semantics: hnsw.go:413-459).

    Reverse edges group by target row with the static sort/rank pattern:
    fitting edges append into known-free cells; rows that would overflow
    re-run the diversity selection over (current row + appended sources).
    Overflow rows are processed in ``lax.scan`` chunks of ``u_budget``
    rows, with the static chunk count sized so EVERY distinct overflow row
    is covered (ceil(B*deg / u_budget) >= the worst case): with
    keep_pruned back-fill every mature row is always full, so in a grown
    graph every reverse edge lands here — a single budget-capped pass
    dropped most back-edges to fresh nodes, starving their in-degree and
    collapsing streaming recall (round-3 measured 0.67 live recall at 1M).
    Only per-row appended sources beyond ``e_budget`` are dropped (a row
    that popular already has e_budget closer announcements competing).
    Returns (adj', fill', spilled) where ``spilled`` counts those dropped
    back-edges — bounded recall cost, surfaced to the host as one
    scalar."""
    metric = DistanceType.parse(metric)
    rows_cap, deg = adj.shape
    B = slots.shape[0]

    # ---- forward rows
    row_of_new = jnp.where(
        connect & (slots >= 0), pos_map[jnp.maximum(slots, 0)], rows_cap
    )
    adj = adj.at[row_of_new].set(sel, mode="drop")
    fill = fill.at[row_of_new].set(jnp.sum(sel >= 0, axis=1), mode="drop")

    # ---- reverse edges, grouped by target row
    tgt = sel.reshape(-1)  # [B*deg]
    src = jnp.repeat(slots, deg)
    ok = connect[:, None].repeat(deg, 1).reshape(-1) & (tgt >= 0) & (src >= 0)
    row = jnp.where(ok, pos_map[jnp.maximum(tgt, 0)], rows_cap)
    ok = ok & (row < rows_cap) & (row >= 0)
    row = jnp.where(ok, row, rows_cap)

    order = jnp.argsort(row)
    srow = row[order]
    ssrc = src[order]
    stgt = tgt[order]
    sok = srow < rows_cap
    E = srow.shape[0]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), srow[1:] != srow[:-1]]
    )
    pos_e = jnp.arange(E, dtype=jnp.int32)
    start_pos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pos_e, 0)
    )
    rank = pos_e - start_pos
    base = fill[jnp.minimum(srow, rows_cap - 1)]
    col = base + rank
    fits = sok & (col < deg)

    adj = adj.at[
        jnp.where(fits, srow, rows_cap), jnp.where(fits, col, 0)
    ].set(ssrc, mode="drop")
    fill = fill.at[jnp.where(fits, srow, rows_cap)].add(
        1, mode="drop"
    )

    # ---- overflow rows: re-select over (current row + appended sources)
    over = sok & ~fits
    orank = col - deg  # 0-based index among a row's overflow sources
    first_over = over & (
        jnp.concatenate([jnp.ones((1,), bool), ~over[:-1] | is_start[1:]])
    )
    # rows are contiguous after the sort, so a running count of first_over
    # numbers the overflow rows globally; chunk c processes rows
    # [c*u_budget, (c+1)*u_budget). n_chunks covers the worst case (every
    # edge a distinct full row), so no overflow ROW is ever dropped.
    n_chunks = max(1, -(-(B * deg) // u_budget))
    U = n_chunks * u_budget
    ouidx = jnp.cumsum(first_over.astype(jnp.int32)) - 1
    keep_e = over & (orank < e_budget)
    extras = jnp.full((U, e_budget), -1, jnp.int32).at[
        jnp.where(keep_e, ouidx, U), jnp.where(keep_e, orank, 0)
    ].set(ssrc, mode="drop")
    orows = jnp.full((U,), rows_cap, jnp.int32).at[
        jnp.where(first_over, ouidx, U)
    ].set(srow, mode="drop")
    otgts = jnp.full((U,), -1, jnp.int32).at[
        jnp.where(first_over, ouidx, U)
    ].set(stgt, mode="drop")

    def chunk(carry, xs):
        # typical batches fill only the first chunk or two; lax.cond skips
        # the dead tail's [u, C, C] re-selection at runtime
        orows_c, _, _ = xs
        return jax.lax.cond(
            jnp.any(orows_c < rows_cap), _chunk_body,
            lambda c, _x: c, carry, xs,
        ), None

    def _chunk_body(carry, xs):
        adj_c, fill_c = carry
        orows_c, otgts_c, extras_c = xs
        live_o = orows_c < rows_cap
        cur = adj_c[jnp.minimum(orows_c, rows_cap - 1)]  # [u, deg]
        # a mutual pair (new A selects new B forward, B announces into A's
        # row which already holds B) would duplicate B: drop such extras
        dup = jnp.any(
            extras_c[:, :, None] == cur[:, None, :], axis=2
        ) & (extras_c >= 0)
        extras_c = jnp.where(dup, -1, extras_c)
        c_ids = jnp.concatenate([cur, extras_c], axis=1)
        c_ids = jnp.where(live_o[:, None], c_ids, -1)
        q_vecs = vectors[jnp.maximum(otgts_c, 0)].astype(jnp.float32)
        c_vecs = vectors[jnp.maximum(c_ids, 0)]
        c_d = _batched_distance(q_vecs, c_vecs, metric, compute_dtype)
        c_d = jnp.where(c_ids >= 0, c_d, MASKED_DIST)
        sel_o, _ = select_neighbors(
            q_vecs, c_ids, c_d, vectors, metric=metric, m=deg,
            compute_dtype=compute_dtype, keep_pruned=keep_pruned,
        )
        adj_c = adj_c.at[
            jnp.where(live_o, orows_c, rows_cap)
        ].set(sel_o, mode="drop")
        fill_c = fill_c.at[jnp.where(live_o, orows_c, rows_cap)].set(
            jnp.sum(sel_o >= 0, axis=1), mode="drop"
        )
        return (adj_c, fill_c)

    (adj, fill), _ = jax.lax.scan(
        chunk, (adj, fill),
        (orows.reshape(n_chunks, u_budget),
         otgts.reshape(n_chunks, u_budget),
         extras.reshape(n_chunks, u_budget, e_budget)),
    )

    spilled = jnp.sum(over & ~keep_e)
    return adj, fill, spilled


@partial(jax.jit, static_argnames=("metric", "m", "compute_dtype",
                                   "keep_pruned"))
def select_neighbors(
    query_vecs: jax.Array,  # f32[B, d] the points being connected
    cand_ids: jax.Array,  # i32[B, C] candidates (-1 pad)
    cand_dist: jax.Array,  # f32[B, C] distance(query, candidate)
    vectors: jax.Array,  # f32[cap, d]
    *,
    metric: str,
    m: int,
    compute_dtype=jnp.float32,
    keep_pruned: bool = True,
):
    """Batched diversity heuristic with pruned back-fill.

    Greedy over candidates in ascending distance order: accept c unless some
    already-accepted s has d(c, s) < d(c, query). With ``keep_pruned``
    (default), remaining slots then fill with the NEAREST rejected
    candidates — diversity decides the ordering, not the edge count. The
    full-occlusion rule alone leaves dense-cluster nodes with few edges
    and starves their in-degree (measured: recall plateau ~0.965 at
    N=100k no ef could break); the reference's heuristic is looser still —
    it occludes only against the single closest selected neighbor with a
    0.9 slack (selectNeighborsHeuristic, pkg/arrowindex/graph.go:953-984)
    — so back-fill also tracks its effective edge density. Returns
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

    # compact: selected first (ascending distance), then — keep_pruned —
    # the nearest rejected candidates; -1 pad; always m columns
    kk = min(m, C)
    if keep_pruned:
        # offset pushes pruned candidates after every selected one while
        # keeping both groups distance-ordered (offset << MASKED_DIST)
        sel_d = jnp.where(sel_mask, cand_dist, cand_dist + 1e30)
        sel_d = jnp.where(ok & (cand_dist < MASKED_DIST), sel_d, MASKED_DIST)
        _neg, sel_order = jax.lax.top_k(-sel_d, kk)
        out_d = jnp.take_along_axis(cand_dist, sel_order, axis=1)
        out_d = jnp.where(-_neg >= MASKED_DIST, MASKED_DIST, out_d)
    else:
        sel_d = jnp.where(sel_mask, cand_dist, MASKED_DIST)
        neg_top, sel_order = jax.lax.top_k(-sel_d, kk)
        out_d = -neg_top
    out_i = jnp.take_along_axis(cand_ids, sel_order, axis=1)
    out_i = jnp.where(out_d >= MASKED_DIST, -1, out_i)
    if kk < m:
        pad = m - kk
        out_d = jnp.pad(out_d, ((0, 0), (0, pad)), constant_values=MASKED_DIST)
        out_i = jnp.pad(out_i, ((0, 0), (0, pad)), constant_values=-1)
    return out_i, out_d
