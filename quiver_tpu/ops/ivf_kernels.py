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
    # row block: <= 256 MB of scores. Floor to a pow2 first: capacity is a
    # {2^k, 3*2^(k-1)} ladder rung, so any pow2 <= 2^(k-1) divides it —
    # halving a non-pow2 budget (e.g. (1<<26)//K for non-pow2 K) otherwise
    # degenerates to bs=2 and a 100k-step sequential scan.
    bs = max(1, min(n, (1 << 26) // max(k, 1)))
    bs = 1 << (bs.bit_length() - 1)
    while n % bs != 0:
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
    vectors_dev=None,
    valid_dev=None,
    pace=None,
):
    """K-means over the live rows. Returns (centroids f32[k, d],
    assign i32[n] with -1 for invalid rows). Runs Lloyd on device; empty
    clusters are re-seeded from random live rows on host (rare).

    ``vectors_dev``/``valid_dev``: an already-device-resident corpus copy
    (the store's device view) to run Lloyd on instead of re-uploading the
    host arrays — at 10M x 128-d that upload is 5.1 GB. Host ``vectors``
    still serves the tiny init/empty-reseed gathers."""
    rng = np.random.default_rng(seed)
    live = np.flatnonzero(valid)
    if len(live) < k:
        raise ValueError(f"need at least k={k} live rows, have {len(live)}")
    init = vectors[rng.choice(live, size=k, replace=False)].astype(np.float32)
    x = (
        jnp.asarray(vectors, jnp.float32) if vectors_dev is None
        else vectors_dev
    )
    vdev = jnp.asarray(valid, bool) if valid_dev is None else valid_dev
    if pace is None:
        cents, assign = _lloyd_iters(x, jnp.asarray(init), vdev, n_iters)
    else:
        # paced (background maintenance): one Lloyd iteration per device
        # program, synced + yielded between — an 8-iter single program
        # monopolizes the chip for seconds and every serving query
        # dispatched behind it eats that wall (bench_churn measured a 6x
        # QPS dip across the rebuild window). One compiled 1-iter program
        # is reused across iterations; the redundant per-call final
        # assignment pass is the price of the bounded stall.
        c = jnp.asarray(init)
        for _ in range(max(n_iters - 1, 0)):
            c, _ = _lloyd_iters(x, c, vdev, 1)
            np.asarray(c[0, 0])  # real sync (tunnel-safe), then yield
            pace()
        cents, assign = _lloyd_iters(x, c, vdev, 1)
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


def split_oversized(
    vectors: np.ndarray,
    cents: np.ndarray,
    assign: np.ndarray,
    cmax: int,
    *,
    seed: int = 0,
    target_fill: float = 0.75,
):
    """Ensure no cluster exceeds ``cmax`` rows by SPLITTING oversized
    clusters into extra local centroids (mini-Lloyd), instead of spilling
    their overflow rows into distant clusters.

    Spill is a recall ceiling: a spilled row lives in a block whose centroid
    is far from the row, so the probes that should find it never scan it
    (measured: ~0.95 recall saturation on clustered corpora regardless of
    n_probe). Split centroids stay ON the data they cover, so a query that
    would have probed the fat cluster probes its fragments instead.

    Returns ``(cents, assign)`` with possibly more centroids; host-side,
    runs once per (re)build.
    """
    rng = np.random.default_rng(seed)
    assign = assign.copy()
    cents = list(np.asarray(cents, np.float32))
    counts = np.bincount(assign[assign >= 0], minlength=len(cents))
    queue = [c for c in np.flatnonzero(counts > cmax)]
    while queue:
        c = queue.pop()
        rows = np.flatnonzero(assign == c)
        m = len(rows)
        if m <= cmax:
            continue
        x = vectors[rows].astype(np.float32)
        parts = max(2, int(np.ceil(m / (target_fill * cmax))))
        seeds = x[rng.choice(m, size=parts, replace=False)].copy()
        xns = np.sum(x * x, axis=1)
        a = np.zeros(m, np.int64)
        for _ in range(8):
            d = xns[:, None] - 2.0 * (x @ seeds.T)  # + const per part
            d += np.sum(seeds * seeds, axis=1)[None, :]
            a = d.argmin(axis=1)
            for j in range(parts):
                sel = a == j
                if sel.any():
                    seeds[j] = x[sel].mean(axis=0)
        part_counts = np.bincount(a, minlength=parts)
        if part_counts.max() > cmax and part_counts.max() >= m:
            # degenerate (e.g. identical rows): force an even split — the
            # fragments share one location, so probe ranking is unaffected
            a = np.arange(m) % parts
            for j in range(parts):
                seeds[j] = x[a == j].mean(axis=0)
        # part 0 keeps the label; the rest become new centroids
        labels = [c] + [len(cents) + i for i in range(parts - 1)]
        cents[c] = seeds[0]
        cents.extend(seeds[1:])
        for j in range(1, parts):
            assign[rows[a == j]] = labels[j]
        for j in range(parts):
            if np.count_nonzero(a == j) > cmax:
                queue.append(labels[j])
    return np.asarray(cents, np.float32), assign


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
                # -inf = ineligible cluster (reserved ids in the sharded
                # engine's padded id space — parallel/sharded_ivf.py)
                if room[c] > 0 and np.isfinite(s[i, c]):
                    assign[row] = c
                    room[c] -= 1
                    break
            else:  # pragma: no cover - only if total capacity < live rows
                raise RuntimeError("IVF balance: no cluster has room")
    return assign


# --------------------------------------------------------------------- query


_INT_MASK = np.int32(0x7FFFFFFF)


def _to_key(s):
    """f32 -> monotone i32: an order-preserving involution (nonnegative
    floats map to themselves bitwise; negative floats flip their
    magnitude bits), so integer max == float max. Same transform used by
    the fused Pallas kernel (ops/ivf_pallas.py docstring)."""
    b = jax.lax.bitcast_convert_type(s, jnp.int32)
    return b ^ (jax.lax.shift_right_arithmetic(b, 31) & _INT_MASK)


def _from_key(key):
    """Inverse of :func:`_to_key` (it is an involution)."""
    b = key ^ (jax.lax.shift_right_arithmetic(key, 31) & _INT_MASK)
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def _pack_lane(s, lane_mask):
    """f32 scores -> monotone i32 keys whose low bits carry the LANE
    index (position within the trailing axis). A max over the packed
    keys then yields score AND argmax position in ONE pass — the
    windowed candidate reduce needs no argmax passes at all. The score
    loses log2(W) mantissa bits (~2^-18 relative at W=32), far below
    the bf16 noise already in the dots."""
    key = _to_key(s)
    lane = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
    return (key & ~lane_mask) | (lane & lane_mask)


def _mask_key(w: int) -> np.int32:
    """Packed key of NEG_BIG with zero lane bits: the masked-entry
    sentinel (stays a normal f32 under the involution — no NaN risk in
    downstream approx_max_k)."""
    b = np.float32(NEG_BIG).view(np.int32).item()
    return np.int32((b ^ ((b >> 31) & 0x7FFFFFFF)) & ~(w - 1))


@partial(
    jax.jit,
    static_argnames=(
        "metric", "k", "n_probe", "q_cap", "compute_dtype", "oversample",
        "probe_approx", "probe_sel_approx", "formulation", "seg_width",
        "rescore", "fused_interpret", "fused_kg",
    ),
)
def ivf_query(
    q: jax.Array,  # f32[B, d]
    centroids: jax.Array,  # f32[K, d]
    cent_norms_sq: jax.Array,  # f32[K]
    blocks_t: jax.Array,  # [K, d, Cmax] RESIDUALS v - c_k (compute dtype)
    block_slot: jax.Array,  # i32[K, Cmax] global store slot (-1 pad)
    block_rns: jax.Array,  # f32[K, Cmax] residual norms |v - c_k|^2
    block_inv_norms: jax.Array,  # f32[K, Cmax] 1/|v| (full vector)
    block_keep: jax.Array,  # bool[K, Cmax] occupied & live & facet mask
    store_vectors: jax.Array,  # f32[cap, d] for the exact rescore
    *,
    metric: str,
    k: int,
    n_probe: int,
    q_cap: int,
    compute_dtype=jnp.bfloat16,
    oversample: int = 3,
    probe_approx: float | None = 0.95,
    probe_sel_approx: float | None = None,
    formulation: str = "pairs",
    seg_width: int | None = 32,
    rescore: bool = True,
    fused_interpret: bool = False,
    fused_kg: int = 4,
):
    """Pruned batched search. Returns (dist f32[B, k], slot i32[B, k]) with
    exact f32 distances, -1 for empty.

    Design decisions that carry the engine (profiled on TPU v5e at 1M x
    128-d — benches/profile_ivf*.py, profile_ragged*.py):

    * **Grouped matmul, no block gather.** (query, probe) pairs sort by
      cluster — MoE-style: pairs are tokens, clusters are experts — and
      the probe matmul reads each cluster block once, streamed from HBM.
      Three formulations share everything else:

      - ``formulation="pairs"`` (default): ``jax.lax.ragged_dot`` of the
        pair-sorted query rows [BP, d] against blocks_t [K, d, Cmax].
        Every pair is scored (no drops, no q_cap padding); positions
        pack into the score keys so the whole reduce chain is argmax-
        and gather-free (see :func:`_pairs_candidates` — measured 2.6x
        faster end-to-end than the einsum path at the serving shape).
      - ``formulation="einsum"``: per-cluster query lists qlist[K, q_cap]
        + one batched einsum. A cluster probed by more than ``q_cap``
        queries drops the overflow pairs (q_cap auto-sizes to ~4x the
        mean load). Kept for comparison and as a fallback where
        ragged_dot lowers poorly.
      - ``formulation="fused"``: the Pallas single-kernel stage
        (ops/ivf_pallas.py; euclidean/dot only).

    * **Residual encoding.** Blocks hold ``v - c_k`` in bf16 and the
      per-(query, cluster) constants re-enter in f32 from the probe stage.
      Raw bf16 affine scores carry ~|q||v|*2^-8 absolute noise, which
      swamps true neighbor gaps whenever data sits away from the origin
      (measured: recall 0.05 on an offset blob); residual magnitudes are
      cluster radii, so the noise shrinks to ~|q-c||v-c|*2^-8 — below the
      gaps the ranking must resolve. Exact-rescore survivors in f32 fix
      the rest. For euclidean: |q-v|^2 = |q-c|^2 - 2(q-c)·(v-c) + |v-c|^2
      with |q-c|^2 exact from centroid scores; for dot/cosine:
      q·v = q·c + q·(v-c) with q·c exact.

    * **Windowed candidate reduce** (``seg_width``): ``lax.approx_max_k``
      measured ~70x slower than max/argmax passes at [131k, 1152]
      (benches/profile_reduce.py), so the per-query candidate reduce runs
      as top-2-per-window segmented argmax over windows of ``seg_width``
      lanes, then one small partial top-k over the [B, 2*P*S] window
      winners. A true neighbor is lost only when 3+ of the query's top-k
      land in the same window of the same cluster (<1% measured at W=32).

    * **Score-derived distances** (``rescore=False``): residual encoding
      makes the stage scores exact up to bf16 noise on cluster-radius
      magnitudes, so distances are reconstructed from the affine scores
      (d^2 = |q|^2 - score for L2) instead of gathering survivor rows —
      the [B*n_sur] random row gather was the single most expensive stage
      at serving batch sizes (~110 ns per gathered row on v5e).
      ``rescore=True`` keeps the exact f32 re-rank of the oversampled
      survivor set (slightly higher recall, exact output distances).

    ``oversample``: survivors kept through the low-precision ranking
    stage, as a multiple of k. ``probe_approx``: recall target of the
    partial reduces (None = exact sort). ``probe_sel_approx``:
    recall target for the top-P probe selection itself (None = exact;
    only used when n_probe > 16 — below that, iterated argmax is exact
    and faster than both sort and approx_max_k)."""
    metric = DistanceType.parse(metric)
    B, d = q.shape
    K, _, Cmax = blocks_t.shape
    P = min(n_probe, K)

    # ---- 1. probe selection: f32 affine centroid scores, top-P
    c_dots, c_aff, probe, caff = probe_stage(
        q, centroids, cent_norms_sq, metric, P, probe_sel_approx
    )

    # ---- 2. sort (query, probe) pairs by cluster (static shapes)
    BP = B * P
    flat_c = probe.reshape(BP)
    order = jnp.argsort(flat_c).astype(jnp.int32)
    sorted_c = flat_c[order]
    b_of = (order // P).astype(jnp.int32)

    if formulation == "fused":
        if BP > 196_608:
            # the kernel scalar-prefetches order i32[B*P] into SMEM (1 MiB
            # on v5e); past this it fails deep in Mosaic with an opaque
            # "prefetched SMEM operand" allocation error (measured: OK at
            # B=65536*P=3, fails at P=4). The pairs path has no such bound.
            raise ValueError(
                f"fused formulation: B*n_probe={BP} exceeds the SMEM "
                "scalar-prefetch budget (196608); use formulation='pairs'"
            )
        best_s, best_flat = _fused_candidates(
            q, c_dots, c_aff, probe,
            blocks_t, block_rns, block_keep, centroids,
            metric=metric, k=k, compute_dtype=compute_dtype,
            oversample=oversample, probe_approx=probe_approx,
            seg_width=seg_width or 32, interpret=fused_interpret,
            kg=fused_kg,
        )
    elif formulation == "einsum":
        best_s, best_flat = _einsum_candidates(
            q, centroids, c_dots, c_aff, order, sorted_c, b_of, flat_c,
            blocks_t, block_rns, block_inv_norms, block_keep,
            metric=metric, k=k, q_cap=q_cap, compute_dtype=compute_dtype,
            oversample=oversample, probe_approx=probe_approx,
            seg_width=seg_width,
        )
    else:
        best_s, best_flat = _pairs_candidates(
            q, centroids, c_dots, caff, probe, order, sorted_c, b_of,
            blocks_t, block_rns, block_inv_norms, block_keep,
            metric=metric, k=k, compute_dtype=compute_dtype,
            oversample=oversample, probe_approx=probe_approx,
            seg_width=seg_width,
        )
    n_sur = best_s.shape[1]
    k_out = min(k, n_sur)
    bslot_flat = block_slot.reshape(-1)

    if rescore:
        # ---- exact f32 rescore of the survivors + final top-k
        best_slot = jnp.where(
            best_s > NEG_BIG / 2, bslot_flat[best_flat], -1
        )
        rows = store_vectors[jnp.maximum(best_slot, 0)].astype(jnp.float32)
        from quiver_tpu.ops.distance import distance_pairs

        qb = jnp.broadcast_to(q[:, None, :], rows.shape).reshape(-1, d)
        dist = distance_pairs(qb, rows.reshape(-1, d), metric).reshape(
            B, n_sur)
        dist = jnp.where(best_slot >= 0, dist, MASKED_DIST)
        neg_top, posn = jax.lax.top_k(-dist, k_out)
        dist = -neg_top
        best_slot = jnp.take_along_axis(best_slot, posn, axis=1)
        best_slot = jnp.where(dist >= MASKED_DIST, -1, best_slot)
    else:
        # ---- score-derived distances: rank by stage score, reconstruct
        # the distance from the affine identity. Slot resolution is
        # DEFERRED to the final [B, k] winners and position selection
        # runs as a one-hot contraction: profile_stages.py measured the
        # [B, n_sur]-scale take_along_axis + flat slot gather at ~8
        # ns/ELEMENT on v5e — 10.9 ms of the round-2 path's 27.6 —
        # while the one-hot sum is pure VPU and the deferred gather
        # touches k/oversample as many elements.
        top_s, posn = jax.lax.top_k(best_s, k_out)
        oh = posn[:, :, None] == jnp.arange(n_sur, dtype=posn.dtype)[
            None, None, :]
        flat_k = jnp.sum(jnp.where(oh, best_flat[:, None, :], 0), axis=2)
        best_slot = jnp.where(
            top_s > NEG_BIG / 2, bslot_flat[flat_k], -1
        )
        dist = scores_to_distances(top_s, q, metric)
        dist = jnp.where(best_slot >= 0, dist, MASKED_DIST)
    if k_out < k:
        pad = k - k_out
        dist = jnp.pad(dist, ((0, 0), (0, pad)), constant_values=MASKED_DIST)
        best_slot = jnp.pad(best_slot, ((0, 0), (0, pad)), constant_values=-1)
    return dist, best_slot


def scores_to_distances(top_s, q, metric):
    """Reconstruct output distances from affine stage scores (the
    score-derived ``rescore=False`` path — no survivor row gather).
    For cosine, stage scores are q·v/|v| (the 1/|q| factor is
    rank-neutral and omitted in-stage); restore it so returned VALUES
    match distance_pairs for unnormalized queries, clamped likewise."""
    if metric == DistanceType.COSINE:
        qinv = jax.lax.rsqrt(
            jnp.maximum(jnp.sum(q * q, axis=1, keepdims=True), 1e-30)
        )
        return 1.0 - jnp.clip(top_s * qinv, -1.0, 1.0)
    if metric == DistanceType.DOT_PRODUCT:
        return 1.0 - top_s
    qns = jnp.sum(q * q, axis=1, keepdims=True)
    d2 = jnp.maximum(qns - top_s, 0.0)
    if metric == DistanceType.EUCLIDEAN:
        return jnp.sqrt(d2)
    return d2


def probe_stage(
    q, centroids, cent_norms_sq, metric, P: int, probe_sel_approx,
    cluster_live=None,
):
    """Stage 1 of the IVF query: metric-specific centroid scores + top-P
    probe selection. Returns ``(c_dots f32[B, K], c_aff f32[B, K],
    probe i32[B, P], caff f32[B, P] | None)``.

    ``caff`` is the per-(query, probe) f32 constant of the affine
    identity. For euclidean/dot the probe score IS that constant (at
    worst 7-bit-lane-quantized, ~2^-16 relative — far below the bf16
    stage noise); cosine candidates fetch ``c_dots`` themselves (caff
    None). ``cluster_live`` masks reserved/empty cluster ids out of
    probe selection (the sharded engine pads the cluster id space —
    parallel/sharded_ivf.py)."""
    c_dots = q @ centroids.T  # f32[B, K]
    c_aff = 2.0 * c_dots - cent_norms_sq[None, :]  # -|q-c|^2 + |q|^2
    if metric == DistanceType.COSINE:
        c_scores = c_dots * jax.lax.rsqrt(
            jnp.maximum(cent_norms_sq, 1e-30)
        )[None, :]
    elif metric == DistanceType.DOT_PRODUCT:
        c_scores = c_dots
    else:  # euclidean family probes by true centroid distance
        c_scores = c_aff
    if cluster_live is not None:
        c_scores = jnp.where(cluster_live[None, :], c_scores, NEG_BIG)
    K = centroids.shape[0]
    probe, pscore = _select_probes(c_scores, P, K, probe_sel_approx)
    caff = None if metric == DistanceType.COSINE else pscore
    return c_dots, c_aff, probe, caff


def _select_probes(c_scores, P: int, K: int, probe_sel_approx):
    """Top-P probe selection over [B, K] centroid scores. Returns
    (probe i32[B, P], score f32[B, P]).

    Three regimes, all profiled on v5e (benches/profile_reduce.py,
    lab_pairs2.py):

    * approx requested (``probe_sel_approx`` set), K >= 256 with enough
      128-lane windows (nwin >= P, so no window must contribute more than
      2 of the selected P): top-2 per window via packed keys (2 max
      passes, argmax-free) + one tiny exact top-P over the window winners
      — 0.70 ms at [16k, 1405] vs 1.66 ms for iterated argmax. A probe is
      lost only when 3+ of the true top-P centroids share one window; the
      engine permutes cluster ids at build (index/ivf.py) so windows
      really are a random partition of space and that event stays rare.
      ``probe_sel_approx=None`` always takes an EXACT path — imported or
      sharded-renumbered layouts carry no window-randomness guarantee.
    * small K, P <= 16: iterated argmax (exact).
    * else: approx_max_k / top_k.
    """
    B = c_scores.shape[0]
    nwin = (K + 127) // 128
    if probe_sel_approx is not None and K >= 256 and nwin >= P:
        LM = jnp.int32(127)
        MK = _mask_key(128)
        KP = nwin * 128
        cw = c_scores
        if KP != K:
            cw = jnp.pad(cw, ((0, 0), (0, KP - K)), constant_values=NEG_BIG)
        keyc = _pack_lane(cw, LM).reshape(B, nwin, 128)
        m1 = jnp.max(keyc, axis=2)
        r2 = jnp.where(keyc == m1[:, :, None], MK, keyc)
        m2 = jnp.max(r2, axis=2)
        wins = jnp.concatenate([m1, m2], axis=1)  # [B, 2*nwin]
        wkey, wsel = jax.lax.top_k(wins, P)
        wid = jnp.where(wsel >= nwin, wsel - nwin, wsel)
        probe = wid * 128 + (wkey & LM)
        return probe.astype(jnp.int32), _from_key(wkey & ~LM)
    if P <= 16:
        # iterated argmax: P cheap passes, exact (approx_max_k and top_k
        # are both far slower at [B, K] shapes — profile_reduce.py)
        sm = c_scores
        cols = []
        for _ in range(P):
            a = jnp.argmax(sm, axis=1).astype(jnp.int32)
            cols.append(a)
            sm = sm.at[jnp.arange(B), a].set(-jnp.inf)
        probe = jnp.stack(cols, axis=1)  # i32[B, P]
    elif probe_sel_approx is not None and 2 * P <= K:
        _, probe = jax.lax.approx_max_k(
            c_scores, P, recall_target=probe_sel_approx
        )
        probe = probe.astype(jnp.int32)
    else:
        _, probe = jax.lax.top_k(c_scores, P)  # i32[B, P]
    return probe, jnp.take_along_axis(c_scores, probe, axis=1)


def _pairs_candidates(
    q, centroids, c_dots, caff, probe, order, sorted_c, b_of,
    blocks_t, block_rns, block_inv_norms, block_keep,
    *, metric, k, compute_dtype, oversample, probe_approx, seg_width,
    cluster_offset: int = 0,
):
    """Grouped-matmul candidate stage: ``ragged_dot`` of pair-sorted query
    rows against the resident block tensor (pairs = tokens, clusters =
    experts). Every pair is scored — no q_cap drops, no q_cap padding
    (the score tensor is [BP, Cmax], 2.7x smaller than the einsum path's
    [K, q_cap, Cmax] at the serving shape).

    The round-3 redesign (validated in benches/lab_pairs2.py: 10.7 ms vs
    the round-2 einsum path's 27.6 ms at B=16k, P=4, 1M x 128):

    * candidate positions are PACKED into the score keys (f32 bitcast ->
      monotone i32, low log2(W) bits = lane), so the windowed top-2
      reduce is 2 max passes with positions for free — no argmax passes,
      and no [*, Cmax]-scale position bookkeeping;
    * the reduce runs BEFORE the regroup: the inverse-permutation gather
      moves [BP, 2S] winner keys (~320 B rows at W=32), not score rows;
    * the per-pair additive constant ``caff`` (euclidean / dot — it
      cannot change within-pair ranking) re-enters in f32 AFTER the
      within-pair reduce; cosine's per-candidate row scale folds into
      the epilogue before packing;
    * flat block positions of the finalists are reconstructed by
      arithmetic from (probe slot, window, lane) via one-hot sums — no
      take_along_axis at [B, n_sur * ...] scale (measured ~8 ns/element
      on v5e; the round-2 slot stage was 10.9 of 27.6 ms).

    Returns ``(best_s f32[B, n_sur], best_flat i32[B, n_sur])`` where
    ``best_flat`` indexes the flattened [K * Cmax] block grid; scores of
    masked entries are <= NEG_BIG (validity test: ``> NEG_BIG / 2``).
    Window-packed scores are quantized by log2(W) mantissa bits (~2^-18
    relative at W=32), far below the bf16 noise already in the dots.

    ``order`` may be a TRUNCATED pair list (M <= B*P rows — the sharded
    engine keeps only pairs whose cluster lives on this shard,
    parallel/sharded_ivf.py): pairs absent from ``order`` regroup to the
    masked sentinel, and ``probe``/``caff`` stay full [B, P] replicated
    shapes. ``blocks_t`` may then be a local slice whose cluster ids
    ``sorted_c`` index, while ``probe`` carries ids in a larger global
    space — ``best_flat`` is reconstructed from ``probe``, so it indexes
    the GLOBAL [K_global * Cmax] grid."""
    B, d = q.shape
    K, _, Cmax = blocks_t.shape
    P = probe.shape[1]
    BP = B * P
    M = order.shape[0]  # may be < BP (sharded local-pair truncation)
    group_sizes = jnp.bincount(sorted_c, length=K).astype(jnp.int32)
    qp = q[b_of]
    if metric in (DistanceType.EUCLIDEAN, DistanceType.SQUARED_EUCLIDEAN):
        qp = qp - centroids[sorted_c]  # query residual vs this cluster
    dots = jax.lax.ragged_dot(
        qp.astype(compute_dtype), blocks_t.astype(compute_dtype),
        group_sizes, preferred_element_type=jnp.float32,
    )  # f32[BP, Cmax] = (q[-c]) · (v-c)

    # epilogue: in-window scores. ONE gathered [K, Cmax] operand (bias)
    # for euclidean/dot; cosine needs the per-candidate row scale too.
    if metric == DistanceType.COSINE:
        cdots_p = jnp.take_along_axis(c_dots, probe, axis=1).reshape(BP)[order]
        inv_m = jnp.where(block_keep, block_inv_norms, 0.0)
        mask_b = jnp.where(block_keep, 0.0, NEG_BIG)
        scores = (dots + cdots_p[:, None]) * inv_m[sorted_c] + mask_b[sorted_c]
        caff_p = None
    elif metric == DistanceType.DOT_PRODUCT:
        bias = jnp.where(block_keep, 0.0, NEG_BIG)
        scores = dots + bias[sorted_c]
        caff_p = caff.reshape(BP)[order]  # q·c, pair-sorted
    else:
        # -|q-v|^2 + |q|^2 = 2(q-c)·(v-c) - |v-c|^2 + (-|q-c|^2 + |q|^2)
        bias = jnp.where(block_keep, -block_rns, NEG_BIG)
        scores = 2.0 * dots + bias[sorted_c]
        caff_p = caff.reshape(BP)[order]  # -|q-c|^2 + |q|^2, pair-sorted

    # engage the windowed reduce only when one pair's window capacity
    # (2S winners) comfortably covers k — a query's true top-k often
    # lives in ONE cluster, and windows cap what a single pair can
    # contribute (same guard as the einsum path)
    W = seg_width or 0
    if (
        W >= 2 and (W & (W - 1)) == 0 and Cmax % W == 0
        and Cmax // W >= k
    ):
        S = Cmax // W
        LM = jnp.int32(W - 1)
        MK = _mask_key(W)
        keys = _pack_lane(scores, LM).reshape(M, S, W)
        m1 = jnp.max(keys, axis=2)
        r2 = jnp.where(keys == m1[:, :, None], MK, keys)
        m2 = jnp.max(r2, axis=2)
        wins = jnp.concatenate([m1, m2], axis=1)  # i32[M, 2S]
        # regroup winners to queries (inverse permutation) — SMALL rows;
        # pairs not in `order` (sharded truncation) hit the sentinel row
        if M < BP:
            inv = (
                jnp.full(BP, M, jnp.int32)
                .at[order]
                .set(jnp.arange(M, dtype=jnp.int32))
            )
            wins = jnp.concatenate(
                [wins, jnp.full((1, 2 * S), MK, jnp.int32)]
            )
        else:
            inv = (
                jnp.zeros(BP, jnp.int32)
                .at[order]
                .set(jnp.arange(BP, dtype=jnp.int32))
            )
        cand = wins[inv].reshape(B, P, 2 * S)
        if caff_p is not None:
            cand_f = _from_key(cand & ~LM) + caff[:, :, None]
            cand = (_to_key(cand_f) & ~LM) | (cand & LM)
        cand = cand.reshape(B, P * 2 * S)
        n_sur = min(k * oversample, P * 2 * S)
        # survivors: partial top-k on the f32 VIEW of the keys (order
        # matches; lane bits ride along in the low mantissa)
        fkeys = _from_key(cand)
        if probe_approx is not None and 2 * n_sur <= P * 2 * S:
            fbest, sel = jax.lax.approx_max_k(
                fkeys, n_sur, recall_target=probe_approx
            )
        else:
            fbest, sel = jax.lax.top_k(fkeys, n_sur)
        best_key = _to_key(fbest)
        # flat block position by arithmetic + one-hot sum over P (pure
        # VPU — no per-element gather)
        j_of = (sel // (2 * S)).astype(jnp.int32)
        w_of = ((sel % (2 * S)) % S).astype(jnp.int32)
        oh = j_of[:, :, None] == jnp.arange(P, dtype=jnp.int32)[None, None, :]
        cl = jnp.sum(jnp.where(oh, probe[:, None, :], 0), axis=2)
        best_flat = cl * Cmax + w_of * W + (best_key & LM)
        best_s = _from_key(best_key & ~LM)  # lane bits zeroed
        return best_s, best_flat

    # fallback (seg_width unusable for this Cmax): per-pair top-R reduce,
    # then regroup and merge — still drop-free
    if caff_p is not None:
        # additive per-pair constant cannot change within-pair ranking;
        # adding it pre-reduce here keeps one code path
        scores = scores + caff_p[:, None]
    R = min(Cmax, max(16, k))
    if probe_approx is not None and 2 * R <= Cmax:
        s_pair, pos = jax.lax.approx_max_k(
            scores, R, recall_target=probe_approx
        )
    else:
        s_pair, pos = jax.lax.top_k(scores, R)
    # flat block positions in the GLOBAL cluster grid (cluster_offset
    # rebases local ids for the sharded engine)
    fpos = (sorted_c + cluster_offset)[:, None] * Cmax + pos  # [M, R]

    if M < BP:
        inv = (
            jnp.full(BP, M, jnp.int32)
            .at[order]
            .set(jnp.arange(M, dtype=jnp.int32))
        )
        s_pair = jnp.concatenate(
            [s_pair, jnp.full((1, R), NEG_BIG, s_pair.dtype)]
        )
        fpos = jnp.concatenate([fpos, jnp.zeros((1, R), fpos.dtype)])
    else:
        inv = (
            jnp.zeros(BP, jnp.int32)
            .at[order]
            .set(jnp.arange(BP, dtype=jnp.int32))
        )
    cand_s = s_pair[inv].reshape(B, P * R)
    cand_f = fpos[inv].reshape(B, P * R)
    n_sur = min(k * oversample, P * R)
    if probe_approx is not None and 2 * n_sur <= P * R:
        best_s, sel = jax.lax.approx_max_k(
            cand_s, n_sur, recall_target=probe_approx
        )
    else:
        best_s, sel = jax.lax.top_k(cand_s, n_sur)
    best_f = jnp.take_along_axis(cand_f, sel, axis=1)
    return best_s, best_f


def _einsum_candidates(
    q, centroids, c_dots, c_aff, order, sorted_c, b_of, flat_c,
    blocks_t, block_rns, block_inv_norms, block_keep,
    *, metric, k, q_cap, compute_dtype, oversample, probe_approx,
    seg_width=None,
):
    """Per-cluster query-list candidate stage: invert pairs into
    qlist[K, q_cap] (rank >= q_cap drops) and run one batched einsum
    against the resident blocks. One [BP, Cmax] row gather brings scores
    back to queries (WIDE rows — TPU gathers pay a flat ~110 ns/row, so
    the regroup must move the big tensor, not the reduced one); then the
    windowed top-2 reduce (``seg_width``) or, when shapes don't allow it,
    one partial top-k over [B, P*Cmax]. Returns ``(best_s, best_flat)``
    like :func:`_pairs_candidates`."""
    B, d = q.shape
    K, _, Cmax = blocks_t.shape
    BP = b_of.shape[0]
    P = BP // B
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_c[1:] != sorted_c[:-1]]
    )
    pos = jnp.arange(BP, dtype=jnp.int32)
    start_pos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pos, 0)
    )
    rank = pos - start_pos  # rank of the pair within its cluster
    in_cap = rank < q_cap
    col = jnp.where(in_cap, rank, q_cap)  # q_cap = out of bounds -> drop
    qlist = (
        jnp.full((K, q_cap), -1, jnp.int32)
        .at[sorted_c, col]
        .set(b_of, mode="drop")
    )

    # batched per-cluster matmul against the RESIDENT blocks
    have_q = qlist >= 0
    qsel = jnp.maximum(qlist, 0)
    qf = q[qsel]  # f32[K, q_cap, d]
    if metric in (DistanceType.EUCLIDEAN, DistanceType.SQUARED_EUCLIDEAN):
        qf = qf - centroids[:, None, :]  # query residual vs this cluster
    dots = jnp.einsum(
        "kbd,kdc->kbc",
        qf.astype(compute_dtype),
        blocks_t.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )  # f32[K, q_cap, Cmax]

    # f32 per-(cluster, query) constants from the probe stage
    if metric == DistanceType.COSINE:
        cdots_sel = jnp.take_along_axis(c_dots.T, qsel, axis=1)  # [K, q_cap]
        scores = (dots + cdots_sel[:, :, None]) * block_inv_norms[:, None, :]
    elif metric == DistanceType.DOT_PRODUCT:
        cdots_sel = jnp.take_along_axis(c_dots.T, qsel, axis=1)
        scores = dots + cdots_sel[:, :, None]
    else:
        # -|q-v|^2 + |q|^2 = 2(q-c)·(v-c) - |v-c|^2 + (-|q-c|^2 + |q|^2)
        caff_sel = jnp.take_along_axis(c_aff.T, qsel, axis=1)  # [K, q_cap]
        scores = (
            2.0 * dots - block_rns[:, None, :] + caff_sel[:, :, None]
        )
    scores = jnp.where(
        block_keep[:, None, :] & have_q[:, :, None], scores, NEG_BIG
    )

    # per-pair score rows back to their queries: pair i (query b_of,
    # probe p_of) reads its row at scores[flat_c[i], rank-in-orig-order];
    # dropped pairs (rank >= q_cap) mask out. One gather — no 3D reduce.
    inv = jnp.argsort(order)  # original pair -> sorted position
    col_orig = jnp.minimum(col, q_cap - 1)[inv]  # [BP]
    in_cap_orig = in_cap[inv]
    W = seg_width
    S = 0 if not W else Cmax // W
    # engage the windowed reduce only when one pair's window capacity (2S)
    # covers k — a query's true top-k often lives in ONE cluster, and
    # windows cap what a single pair can contribute
    if W and Cmax % W == 0 and S >= k and 2 * P * S >= k * oversample:
        # windowed top-2 reduce: the [B, P*S, W] view of the regrouped
        # rows reduces to 2 winners per window by two max/argmax passes
        # (approx_max_k at these shapes measured ~70x slower); flat block
        # positions are reconstructed from (cluster, window, lane), so no
        # [BP, Cmax] slot gather is needed — slots resolve only for the
        # n_sur finalists.
        probe = flat_c.reshape(B, P)
        col_b = col_orig.reshape(B, P)
        in_cap_b = in_cap_orig.reshape(B, P)
        # per-probe regroup: P gathers of B big rows each (measured ~15%
        # faster than one BP-row gather — fewer rows in flight per op)
        parts = [
            jnp.where(
                in_cap_b[:, j:j + 1],
                scores[probe[:, j], col_b[:, j]], NEG_BIG)
            for j in range(P)
        ]
        rows = jnp.stack(parts, axis=1).reshape(B, P * S, W)
        m1 = jnp.max(rows, axis=2)
        a1 = jnp.argmax(rows, axis=2).astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 2)
        r2 = jnp.where(lane == a1[:, :, None], -jnp.inf, rows)
        m2 = jnp.max(r2, axis=2)
        a2 = jnp.argmax(r2, axis=2).astype(jnp.int32)
        cand_s = jnp.concatenate([m1, m2], axis=1)  # [B, 2PS]
        segb = jnp.tile(
            (jnp.arange(S, dtype=jnp.int32) * W)[None, :], (1, P))
        cl = jnp.repeat(probe, S, axis=1)  # [B, P*S]
        f1 = cl * Cmax + segb + a1
        f2 = cl * Cmax + segb + a2
        cand_f = jnp.concatenate([f1, f2], axis=1)
        n_sur = min(k * oversample, 2 * P * S)
        if probe_approx is not None and 2 * n_sur <= 2 * P * S:
            best_s, sel = jax.lax.approx_max_k(
                cand_s, n_sur, recall_target=probe_approx)
        else:
            best_s, sel = jax.lax.top_k(cand_s, n_sur)
        best_f = jnp.take_along_axis(cand_f, sel, axis=1)
        return best_s, best_f

    cand_s = jnp.where(
        in_cap_orig[:, None], scores[flat_c, col_orig], NEG_BIG
    ).reshape(B, P * Cmax)
    cand_f = (
        flat_c[:, None] * Cmax + jnp.arange(Cmax, dtype=jnp.int32)[None, :]
    ).reshape(B, P * Cmax)

    # ONE oversampled partial top-k per query feeds the rescore (bf16
    # stage noise); a slot appears at most once per query — its cluster
    # block is unique and probes are distinct.
    n_sur = min(k * oversample, P * Cmax)
    if probe_approx is not None and 2 * n_sur <= P * Cmax:
        best_s, sel = jax.lax.approx_max_k(
            cand_s, n_sur, recall_target=probe_approx
        )
    else:
        best_s, sel = jax.lax.top_k(cand_s, n_sur)
    best_f = jnp.take_along_axis(cand_f, sel, axis=1)
    return best_s, best_f


def _fused_candidates(
    q, c_dots, c_aff, probe,
    blocks_t, block_rns, block_keep, centroids,
    *, metric, k, compute_dtype, oversample, probe_approx, seg_width,
    interpret=False, kg=4,
):
    """Pallas fused candidate stage (ops/ivf_pallas.py): in-VMEM query
    gather + per-pair block scoring + windowed top-4 + query-major
    scatter in ONE kernel — the score tensor never reaches HBM, and
    neither the query rows nor the centroid rows are ever gathered
    through XLA's ~110 ns/row HBM gather. Euclidean family and
    dot-product only (cosine's row-scale epilogue can't defer outside
    the window argmax); the per-pair affine constant (caff / q.c) is
    added AFTER unpacking, since it cannot change any within-pair window
    ranking."""
    from quiver_tpu.ops.ivf_pallas import (
        LANES,
        R_WIN,
        WIN,
        fused_block_topw,
        unpack_keys,
    )

    if metric not in (
        DistanceType.EUCLIDEAN, DistanceType.SQUARED_EUCLIDEAN,
        DistanceType.DOT_PRODUCT,
    ):
        raise ValueError(
            f"fused formulation does not support metric {metric}"
        )
    B, d = q.shape
    K, _, Cmax = blocks_t.shape
    P = probe.shape[1]
    S = Cmax // WIN

    # chunking: the accumulator [BPc, 128] i32 + the resident query chunk
    # must fit VMEM. Bc rounds down to a power of two so it divides the
    # pow2-padded B even when P is not itself a power of two; a non-pow2
    # B pads to the next Bc multiple by repeating row 0 (extra pairs are
    # scored and sliced off — the engine path already sends pow2 batches,
    # this keeps the public kernel entry shape-safe).
    Bc = max(1, min(B, 16384 // P))
    Bc = 1 << (Bc.bit_length() - 1)
    B0 = B
    pad_rows = (-B) % Bc
    if pad_rows:
        q = jnp.concatenate([q, jnp.broadcast_to(q[:1], (pad_rows, d))])
        probe = jnp.concatenate(
            [probe, jnp.broadcast_to(probe[:1], (pad_rows, P))]
        )
        c_dots = jnp.concatenate(
            [c_dots, jnp.broadcast_to(c_dots[:1], (pad_rows, K))]
        )
        c_aff = jnp.concatenate(
            [c_aff, jnp.broadcast_to(c_aff[:1], (pad_rows, K))]
        )
        B = B + pad_rows
    nchunks = B // Bc
    BPc = Bc * P

    probe_c = probe.reshape(nchunks, BPc)
    order = jnp.argsort(probe_c, axis=1, stable=True).astype(jnp.int32)
    sorted_c = jnp.take_along_axis(probe_c, order, axis=1)
    starts = jax.vmap(
        lambda row: jnp.searchsorted(
            row, jnp.arange(K + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
    )(sorted_c)  # [nchunks, K+1]

    if metric in (DistanceType.EUCLIDEAN, DistanceType.SQUARED_EUCLIDEAN):
        bias = jnp.where(block_keep, -block_rns, NEG_BIG)
        scale, sub_cent = 2.0, True
        caff_mat = jnp.take_along_axis(c_aff, probe, axis=1)  # [B, P]
    else:  # DOT_PRODUCT
        bias = jnp.where(block_keep, 0.0, NEG_BIG)
        scale, sub_cent = 1.0, False
        caff_mat = jnp.take_along_axis(c_dots, probe, axis=1)

    # kg clusters share one grid cell (amortizes the ~fixed per-cell cost
    # that made the KG=1 kernel ~1.7x the pairs path); K pads to a kg
    # multiple with empty groups — no pair ever references them, so their
    # tile loops are zero-trip
    blocks_c = blocks_t.astype(compute_dtype)
    Kp = (K + kg - 1) // kg * kg
    if Kp != K:
        blocks_c = jnp.pad(blocks_c, ((0, Kp - K), (0, 0), (0, 0)))
        centroids = jnp.pad(centroids, ((0, Kp - K), (0, 0)))
        bias = jnp.pad(bias, ((0, Kp - K), (0, 0)), constant_values=NEG_BIG)
        pad = jnp.broadcast_to(
            starts[:, K:K + 1], (nchunks, Kp - K)
        ).astype(jnp.int32)
        starts = jnp.concatenate([starts, pad], axis=1)

    acc = fused_block_topw(
        starts.reshape(-1), order.reshape(-1),
        q.reshape(nchunks, Bc, d),
        blocks_c, centroids, bias,
        K=Kp, Cmax=Cmax, P=P, KG=kg, scale=scale, sub_cent=sub_cent,
        interpret=interpret,
    )  # i32[nchunks, BPc, LANES]
    acc = acc.reshape(B, P, LANES)
    score, pos, valid = unpack_keys(acc)
    scores = jnp.where(
        valid, score + caff_mat[:, :, None], NEG_BIG
    ).reshape(B, P * LANES)
    fpos = (probe[:, :, None] * Cmax + pos).reshape(B, P * LANES)

    n_sur = min(k * oversample, P * R_WIN * S)
    if probe_approx is not None and 2 * n_sur <= P * LANES:
        best_s, sel = jax.lax.approx_max_k(
            scores, n_sur, recall_target=probe_approx)
    else:
        best_s, sel = jax.lax.top_k(scores, n_sur)
    best_f = jnp.take_along_axis(fpos, sel, axis=1)
    return best_s[:B0], best_f[:B0]
