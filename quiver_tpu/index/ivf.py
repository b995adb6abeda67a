"""IVF-Flat engine — k-means partitioned corpus, block-pruned MXU search.

The TPU-first ANN engine (ops/ivf_kernels.py has the kernel rationale): the
full fused flat scan is reduce-bound, so at 1M+ rows the winning structure
prunes work — score only the top-``n_probe`` clusters per query, as one
batched matmul over uniformly-padded cluster blocks, then exactly rescore
winners in f32. Recall is a direct function of ``n_probe`` (tune per
collection; the bench sweeps it).

Engine-protocol notes (quiver_tpu/index/__init__.py):
* deletes cost nothing — validity is a query-time mask over store slots;
* inserts after build append into their nearest cluster's block in place;
  rows that land in a full cluster go to an overflow set that is scanned
  exactly and merged (classic IVF spill), and the index rebuilds itself
  once overflow/growth passes ``rebuild_growth``;
* facet masks fuse into the pruned scan (corpus-wide masks; per-query mask
  matrices fall back to the exact scan, same as the graph engine).

The reference has no comparable structure — its only ANN is HNSW
(pkg/hnsw/hnsw.go); this engine is the redesign SURVEY.md §7's north star
asks for ("blockwise-tile the exact scan" taken to its conclusion).
"""

from __future__ import annotations

import dataclasses
import functools
import threading
import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from quiver_tpu.core.store import VectorStore
from quiver_tpu.index.exact import ExactIndex
from quiver_tpu.ops.ivf_kernels import (
    balance_assignment,
    ivf_query,
    split_oversized,
    train_kmeans,
)
from quiver_tpu.ops.scan import MASKED_DIST, negative_rerank
from quiver_tpu.types import DistanceType
from quiver_tpu.utils.transfer import fetch_np


def _pow2(n: int, lo: int = 8, hi: int = 1 << 30) -> int:
    c = lo
    while c < n and c < hi:
        c *= 2
    return c


def _cmax_shape(want: float) -> int:
    """Block width: multiple of 128 (TPU lane width) rather than a power of
    two — pow2 rounding padded blocks up to 2x, and block HBM traffic is
    the query's floor. Small corpora keep pow2 below 128."""
    w = int(np.ceil(want))
    if w >= 128:
        return (w + 127) // 128 * 128
    return _pow2(w, lo=8)


@jax.jit
def _mask_block_keep(block_keep, block_slot, slot_mask):
    """Fold a slot-addressed facet mask into block space (filtered queries
    only — the unfiltered path reads the maintained block_keep directly)."""
    return block_keep & slot_mask[jnp.maximum(block_slot, 0)]


@jax.jit
def _nearest_centroid_slots(slots, vectors, cent, c_ns, live):
    """(argmax, max) of the nearest live-centroid affine score for STORE
    rows addressed by slot — the gather reads the store's device copy, so
    the write path and refresh never re-upload vector data they already
    synced (tunnel uploads run ~5-14 MB/s; an 8k x 128-d batch is ~4 MB,
    and the former host-array path paid it twice; refresh paid the FULL
    corpus, 512 MB at 1M x 128-d). The max doubles as the drift-detector
    residual readout, like _nearest_centroid."""
    v = vectors[slots]
    scores = 2.0 * (v @ cent.T) - c_ns[None, :]
    scores = jnp.where(live[None, :], scores, -jnp.inf)
    return jnp.argmax(scores, axis=1), jnp.max(scores, axis=1)


@functools.partial(jax.jit, static_argnames=("metric", "k"))
def _overflow_topk(q, slots, vectors, norms_sq, *, metric, k):
    """Exactly score an overflow slot list against a query batch and keep
    the per-query top-k, entirely on device: rows gather from the store's
    device copy by slot (the former host path re-gathered and re-uploaded
    the O x d overflow matrix on EVERY query call — ~25 MB per call at
    O=50k through the tunnel) and only the [B, k] winners download.

    ``slots`` pads to a pow2 length with -1 sentinels (masked to
    MASKED_DIST so they never win)."""
    from quiver_tpu.ops.distance import pairwise_distance

    safe = jnp.maximum(slots, 0)
    rows = vectors[safe]
    d = pairwise_distance(
        q, rows, metric, v_norms_sq=norms_sq[safe]
    )  # [B, O]
    d = jnp.where(slots[None, :] >= 0, d, MASKED_DIST)
    neg_top, pos = jax.lax.top_k(-d, min(k, slots.shape[0]))
    out_d = -neg_top
    out_i = jnp.where(out_d >= MASKED_DIST, -1, slots[pos])
    return out_d, out_i


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _scatter_blocks_dev(
    blocks_t, block_ns, block_inv, block_slot,
    vectors, norms_sq, cent, rows, pos, slots,
):
    """One compiled program for a write batch's block-array maintenance:
    gather the new rows from the store's device copy, form residuals and
    per-row stats on device, and scatter all four block arrays. Replaces
    an eager ``.at[].set`` chain (4 dispatch round trips + a residual
    re-upload per batch — the write-path wall on a remote link). Pad rows
    carry ``rows == K`` (out of bounds) and drop."""
    safe_slot = jnp.maximum(slots, 0)
    v = vectors[safe_slot]
    safe_row = jnp.minimum(rows, cent.shape[0] - 1)
    resid = v - cent[safe_row]
    rns = jnp.sum(resid * resid, axis=1)
    ns = norms_sq[safe_slot]
    inv = jnp.where(ns > 0, jax.lax.rsqrt(jnp.maximum(ns, 1e-30)), 0.0)
    blocks_t = blocks_t.at[rows, :, pos].set(
        resid.astype(blocks_t.dtype), mode="drop"
    )
    block_ns = block_ns.at[rows, pos].set(rns, mode="drop")
    block_inv = block_inv.at[rows, pos].set(inv, mode="drop")
    block_slot = block_slot.at[rows, pos].set(
        slots.astype(block_slot.dtype), mode="drop"
    )
    return blocks_t, block_ns, block_inv, block_slot


@functools.partial(jax.jit, static_argnames=("kc", "cdtype"))
def _layout_dev(block_slot, vectors, norms_sq, cents, *, kc, cdtype):
    """Device-side block layout: gather every placed row from the store's
    device copy and form the four block arrays WITHOUT materializing them
    on host. The former host path built blocks_t on host and re-uploaded
    ~0.7 GB per refresh at 1M x 128-d (50-140 s of tunnel saturation that
    starved concurrent serving during background maintenance; ~1 s of PCIe
    even co-located) — now only the [K, cmax] slot map uploads (~70x less).

    One jitted fori_loop writing kc-cluster chunks in place into
    exactly-K-sized carries: a previous map-over-padded-K + slice-to-K
    version held the padded block tensor AND its sliced copy live at
    once, which OOM'd HBM at 10M x 128-d (the block tensor is ~3.4 GiB
    there; doubling it on top of the 8 GiB store view blew the 15.75 GiB
    budget). The last chunk overlaps the previous instead of padding
    (clamped start; overlap rows recompute identical values), and the
    drift accumulator masks the overlap so each row counts once."""
    K, cmax = block_slot.shape
    d = vectors.shape[1]
    kc = min(kc, K)
    n_chunks = -(-K // kc)

    def body(i, carry):
        bt, rns_all, inv_all, acc = carry
        start = jnp.minimum(i * kc, K - kc)
        bs = jax.lax.dynamic_slice(block_slot, (start, 0), (kc, cmax))
        cc = jax.lax.dynamic_slice(cents, (start, 0), (kc, d))
        keep = bs >= 0
        safe = jnp.maximum(bs, 0)
        sv = vectors[safe]  # [kc, cmax, d]
        resid = jnp.where(keep[..., None], sv - cc[:, None, :], 0.0)
        rns = jnp.sum(resid * resid, axis=2)
        ns = jnp.where(keep, norms_sq[safe], 0.0)
        inv = jnp.where(ns > 0, jax.lax.rsqrt(jnp.maximum(ns, 1e-30)), 0.0)
        uniq = (start + jnp.arange(kc)) >= i * kc  # overlap counts once
        bt = jax.lax.dynamic_update_slice(
            bt, jnp.transpose(resid, (0, 2, 1)).astype(cdtype), (start, 0, 0)
        )
        rns_all = jax.lax.dynamic_update_slice(rns_all, rns, (start, 0))
        inv_all = jax.lax.dynamic_update_slice(inv_all, inv, (start, 0))
        return (
            bt, rns_all, inv_all,
            acc + jnp.sum(jnp.where(uniq[:, None], rns, 0.0)),
        )

    bt, rns_all, inv_all, acc = jax.lax.fori_loop(
        0, n_chunks, body,
        (
            jnp.zeros((K, d, cmax), cdtype),
            jnp.zeros((K, cmax), jnp.float32),
            jnp.zeros((K, cmax), jnp.float32),
            jnp.float32(0.0),
        ),
    )
    return bt, rns_all, inv_all, block_slot, block_slot >= 0, acc


@functools.partial(
    jax.jit, static_argnames=("kc", "cdtype"), donate_argnums=(0, 1, 2, 3)
)
def _layout_dev_chunk(
    bt, rns_all, inv_all, acc, block_slot, cents, vectors, norms_sq,
    start, uniq_from, *, kc, cdtype,
):
    """One kc-cluster chunk of :func:`_layout_dev`, as its own program —
    same math as the fori_loop body, carries donated so the block tensor
    updates in place across calls (no HBM doubling)."""
    K, cmax = block_slot.shape
    d = vectors.shape[1]
    bs = jax.lax.dynamic_slice(block_slot, (start, 0), (kc, cmax))
    cc = jax.lax.dynamic_slice(cents, (start, 0), (kc, d))
    keep = bs >= 0
    safe = jnp.maximum(bs, 0)
    sv = vectors[safe]  # [kc, cmax, d]
    resid = jnp.where(keep[..., None], sv - cc[:, None, :], 0.0)
    rns = jnp.sum(resid * resid, axis=2)
    ns = jnp.where(keep, norms_sq[safe], 0.0)
    inv = jnp.where(ns > 0, jax.lax.rsqrt(jnp.maximum(ns, 1e-30)), 0.0)
    uniq = (start + jnp.arange(kc)) >= uniq_from  # overlap counts once
    bt = jax.lax.dynamic_update_slice(
        bt, jnp.transpose(resid, (0, 2, 1)).astype(cdtype), (start, 0, 0)
    )
    rns_all = jax.lax.dynamic_update_slice(rns_all, rns, (start, 0))
    inv_all = jax.lax.dynamic_update_slice(inv_all, inv, (start, 0))
    return (
        bt, rns_all, inv_all,
        acc + jnp.sum(jnp.where(uniq[:, None], rns, 0.0)),
    )


def _layout_dev_paced(
    block_slot, vectors, norms_sq, cents, *, kc, cdtype, pace
):
    """:func:`_layout_dev` as a host-driven loop of short chunk programs
    with a real sync + cooperative yield between them (background
    maintenance). The single fori_loop program occupies the chip for the
    whole layout (seconds at 1M+), and every serving query dispatched
    behind it eats that wall — bench_churn measured the QPS floor at 6x
    below the mean across a rebuild window. Chunked, the worst query
    stall is one chunk (~tens of ms) plus the pace sleep."""
    K, cmax = block_slot.shape
    d = vectors.shape[1]
    kc = min(kc, K)
    n_chunks = -(-K // kc)
    bt = jnp.zeros((K, d, cmax), cdtype)
    rns_all = jnp.zeros((K, cmax), jnp.float32)
    inv_all = jnp.zeros((K, cmax), jnp.float32)
    acc = jnp.zeros((), jnp.float32)
    cents_j = jnp.asarray(cents)
    for i in range(n_chunks):
        start = min(i * kc, K - kc)
        bt, rns_all, inv_all, acc = _layout_dev_chunk(
            bt, rns_all, inv_all, acc, block_slot, cents_j, vectors,
            norms_sq, jnp.int32(start), jnp.int32(i * kc),
            kc=kc, cdtype=cdtype,
        )
        np.asarray(acc)  # tunnel-real sync: the chunk finished on device
        pace()
    return bt, rns_all, inv_all, block_slot, block_slot >= 0, acc


@jax.jit
def _nearest_centroid(v, cent, c_ns, live):
    """(argmax, max) of the affine nearest-centroid score 2 v.c - |c|^2,
    reserved ids masked. |v - c*|^2 = |v|^2 - max, so the max doubles as a
    residual readout (the refresh drift detector)."""
    s = jnp.where(
        live[None, :], 2.0 * (v @ cent.T) - c_ns[None, :], -jnp.inf
    )
    return jnp.argmax(s, axis=1), jnp.max(s, axis=1)


@dataclass
class IVFConfig:
    #: clusters; None = auto (pow2 nearest 4*sqrt(N) at build time)
    n_clusters: Optional[int] = None
    #: clusters probed per query — THE recall/speed knob
    n_probe: int = 32
    #: per-cluster row capacity factor over the mean. Oversized clusters
    #: SPLIT (extra centroids), so this trades padding (block HBM traffic,
    #: the query floor) against centroid count — keep it tight.
    cmax_factor: float = 1.25
    kmeans_iters: int = 10
    #: recall target of the per-query candidate approx top-k reduce (None =
    #: exact full-sort top_k). This is the engine's recall ceiling for the
    #: survivor set — a true top-k row lost here is gone for good — so it
    #: runs tighter than the usual 0.95 (the measured ceiling at 0.95 was
    #: recall@10 ~ 0.94 regardless of n_probe).
    probe_approx: Optional[float] = 0.98
    #: recall target for the top-P probe selection itself (None = exact;
    #: the [B, K] full sort costs ~4.4 ms at B=2048, K=4096 — losing the
    #: P-th-best probe occasionally costs far less recall than that)
    probe_sel_approx: Optional[float] = 0.99
    #: survivors through the low-precision stage, as a multiple of k
    oversample: int = 4
    #: per-cluster query-list capacity as a multiple of the mean load
    #: B*P/K (pairs beyond it drop; 4x absorbs Poisson skew, and the
    #: scores tensor traffic scales linearly with this)
    q_cap_factor: int = 4
    #: candidate-stage formulation: "auto" resolves to "pairs" (ragged
    #: grouped matmul, drop-free, argmax/gather-free reduce — the
    #: measured winner at serving shapes); "einsum" = per-cluster query
    #: lists capped at q_cap; "fused" = the Pallas single-kernel stage
    #: (ops/ivf_pallas.py) — see ops/ivf_kernels.ivf_query docstring
    formulation: str = "auto"
    #: window width for the segmented top-2 candidate reduce (None = one
    #: partial top-k over [B, P*Cmax]; see ivf_query docstring)
    seg_width: Optional[int] = 32
    #: fused formulation only: clusters per Pallas grid cell (amortizes the
    #: fixed per-cell cost; VMEM-bounded — KG x the block slice must fit
    #: alongside the query chunk and the [BPc, 128] accumulator)
    fused_kg: int = 4
    #: exact f32 re-rank of the oversampled survivors (True) vs
    #: score-derived distances with no survivor gather (False — faster
    #: at serving batch sizes, distances carry bf16-residual noise)
    rescore: bool = True
    #: below this many rows the exact scan is used (and is faster anyway)
    build_threshold: int = 8192
    #: re-layout (cheap :meth:`IVFIndex.refresh`, existing centroids) when
    #: (inserts+deletes since build) / built_size exceeds this
    rebuild_growth: float = 0.3
    #: full retrain (k-means + split) when churn/built_size exceeds this;
    #: between ``rebuild_growth`` and here churn triggers the refresh
    #: re-layout instead — stale centroids still cover an in-distribution
    #: stream, and a retrain at 1M is minutes of wall inside a write call
    retrain_growth: float = 1.0
    #: refresh escalates to a full retrain when the corpus's mean squared
    #: residual (distance to assigned centroid) exceeds this multiple of
    #: the at-build value — the drift detector: an in-distribution stream
    #: keeps the ratio ~1, a shifted distribution blows it up (and stale
    #: centroids would silently cap recall)
    refresh_drift: float = 2.0
    #: PER-ROW drift router: an inserted/updated row whose squared residual
    #: to its nearest centroid exceeds this multiple of the at-build mean
    #: goes to the exact-scanned overflow set instead of a block — the
    #: trained centroids can't represent it, so burying it in its
    #: "nearest" block would hide it from the probes a query near it
    #: selects (measured: live recall 0.80 vs the 0.85 floor on the
    #: engine fuzz when out-of-distribution inserts land in blocks during
    #: the background-maintenance window). refresh() keeps such rows in
    #: overflow (re-layout can't help them — same centroids); a retrain
    #: absorbs them. In-distribution rows have residuals ~1x the mean
    #: with a short tail, so serving-path inserts are unaffected. None
    #: disables the router.
    insert_drift: Optional[float] = 6.0
    #: escalate churn maintenance straight to a retrain when drift-routed
    #: overflow exceeds this fraction of the built corpus (refresh cannot
    #: drain drift rows; only new centroids can)
    drift_rebuild: float = 0.03
    #: run churn-triggered refresh/retrain on a background thread: the old
    #: layout keeps serving (and keeps absorbing writes) while a staging
    #: layout builds from a store snapshot; writes that land during the
    #: rebuild replay onto the staging layout from the store's change feed
    #: and the swap happens under the engine lock, so a write call never
    #: stalls behind k-means (50 s+ at 1M — the reference keeps its heavy
    #: maintenance on a background goroutine too,
    #: pkg/persistence/manager.go:136-148). Explicit build()/refresh()
    #: calls stay synchronous. False = maintenance runs inline inside the
    #: triggering write call (deterministic; tests of the tier policy).
    background_maintenance: bool = True
    #: cooperative yield between the background maintenance job's device
    #: dispatches, in seconds. On one chip the staging rebuild COMPETES
    #: with serving: its big programs (Lloyd iterations, the block-layout
    #: gather) each occupy the device for seconds, and a query dispatched
    #: behind one eats that wall (bench_churn 2026-08-21: QPS floor 6x
    #: under the mean across the rebuild window). Staging engines run
    #: those passes as short chunked programs and sleep this long between
    #: them, bounding any serving query's stall to ~one chunk + the
    #: sleep. 0 disables (maintenance runs flat-out; multi-chip
    #: deployments that dedicate a chip to rebuilds want that).
    maint_pace_s: float = 0.05
    #: auto-tune ``n_probe`` at build time to the smallest value whose
    #: measured recall@10 on a held-out jittered sample meets this target
    #: (None = keep the configured n_probe). The tuner first estimates the
    #: probe-inclusion recall curve host-side (simulating the windowed
    #: probe selection), then verifies the pick with real engine queries
    #: against the exact oracle and escalates if short — so the headline
    #: knob is engine behavior that transfers to any corpus, not a
    #: hand-swept constant (VERDICT r3 next #5; adaptive spirit of
    #: reference pkg/hybrid/adaptive.go:75-174).
    recall_target: Optional[float] = None
    #: held-out sample size for the tuner's oracle measurement. 1024
    #: bounds sampling optimism: the round-4 run at 256 samples measured
    #: 0.982 holdout vs 0.972 realized on 65k queries — one point of
    #: luck, harmless at target 0.95 but enough to pass a near-gate
    #: config that misses; at 1024 the binomial s.e. at recall ~0.95 is
    #: ~0.7 points per-query (~0.2 on the mean over k) (VERDICT r4 #11)
    recall_sample: int = 1024
    #: tuner query jitter, as a fraction of the sample's per-dim std
    #: (matches the serving benches' query model: corpus rows + 0.1σ noise)
    recall_jitter: float = 0.1
    #: tuner search ceiling — refuse to chase an unreachable target past
    #: this many probes (probe cost grows linearly in n_probe)
    n_probe_max: int = 64
    seed: int = 42


#: swap-time replay budget: deltas larger than this replay lock-free first
#: (catch-up loop), so the final locked replay — the only write/query stall
#: the swap imposes — stays small and bounded
_LOCKED_REPLAY_MAX = 8192


class IVFIndex:
    """Inverted-file engine over a shared VectorStore."""

    name = "ivf"
    #: layout gathers rows from the store's device copy (_layout_dev);
    #: the sharded engine keeps the host path — its block arrays place
    #: cluster-sharded over the mesh and its gather source is row-sharded,
    #: so a single-device gather program would mix placements
    _layout_on_device = True

    def __init__(
        self,
        store: VectorStore,
        *,
        config: Optional[IVFConfig] = None,
        compute_dtype=jnp.bfloat16,
        **cfg_overrides,
    ):
        self.store = store
        self.config = config or IVFConfig(**cfg_overrides)
        self.compute_dtype = compute_dtype
        self._exact = ExactIndex(store, compute_dtype=jnp.float32)
        #: bool[K] — False rows are reserved/padded cluster ids that must
        #: never receive assignments or probes (sharded layout pads the
        #: cluster id space; None = all live)
        self._cluster_live = None
        self._built = False
        self._centroids = None  # np f32[K, d]
        self._cent_dev = None  # (centroids, cent_norms_sq) device
        self._blocks_t = None  # device [K, d, Cmax] residuals, compute dtype
        self._block_slot = None  # device i32[K, Cmax]
        self._block_ns = None  # device f32[K, Cmax] residual norms
        self._block_inv = None  # device f32[K, Cmax] 1/|v| full-vector
        self._block_keep = None  # device bool[K, Cmax] occupied & live
        self._keep_pending: list[tuple[int, int, bool]] = []  # lazy scatters
        self._fill = None  # np i64[K]
        self._built_resid = None  # mean |v - c|^2 at layout (drift baseline)
        self._slot_pos = None  # np i64[cap, 2] slot -> (cluster, pos), -1
        self._overflow: set[int] = set()
        #: subset of _overflow that landed there via the per-row drift
        #: router (config.insert_drift) — refresh keeps these out of
        #: blocks; only a retrain drains them
        self._drift: set[int] = set()
        self._built_size = 0
        self._churn = 0
        self._cmax = None  # block width of the current layout
        self._n_retrains = 0  # full k-means builds (operator-visible)
        self._n_refreshes = 0  # cheap re-layouts on existing centroids
        self._tuned_n_probe: Optional[int] = None  # recall_target tuner pick
        self._tuned_recall: Optional[float] = None  # its measured recall@k
        self._tuned_stderr: Optional[float] = None  # holdout sampling stderr
        self._last_rebuild_s = 0.0
        # --- background maintenance (IVFConfig.background_maintenance):
        # the engine lock serializes writes, layout swaps and the query
        # path's host preamble; a staging clone (same class, same store)
        # builds the next layout off-thread and _adopt() transplants it
        self._lock = threading.RLock()
        self._staging = False  # True on maintenance clones (inert triggers)
        #: staging clones set this to config.maint_pace_s: heavy passes
        #: run chunked with a sync + sleep between dispatches so serving
        #: queries interleave (0 on serving engines — no-op)
        self._pace_s = 0.0
        self._layout_gen = 0  # bumps on every installed layout
        self._maint_thread: Optional[threading.Thread] = None
        self._maint_pending: Optional[str] = None
        self._maint_error: Optional[str] = None
        self._maint_swaps = 0
        self._maint_last_stall_s = 0.0
        #: (padded B, k) shapes the serving path has dispatched — the
        #: maintenance thread pre-warms the staging layout's programs at
        #: exactly these shapes before the swap, so a post-swap query
        #: never pays the new block geometry's cold compile mid-stream
        #: (VERDICT r4 #6: QPS dipped 6.5x during a growth rebuild)
        self._served_shapes: set = set()

    # ------------------------------------------------------------ properties

    @property
    def size(self) -> int:
        return self.store.size

    def _metric(self) -> str:
        return self.store.metric.value

    @property
    def n_clusters(self) -> Optional[int]:
        return None if self._centroids is None else len(self._centroids)

    # ---------------------------------------------------------------- build

    def _auto_k(self, n_live: int) -> int:
        # ~sqrt(N) clusters: fatter blocks beat thin ones on TPU — the
        # grouped matmul and the windowed reduce amortize per-cluster
        # overheads over Cmax lanes (profiled at 1M: K~1.4k/Cmax~1.1k
        # beats K~5k/Cmax~384 at equal scanned fraction)
        want = int(np.sqrt(n_live))
        return max(8, min(_pow2(want), n_live // 8))

    def build(self, k: Optional[int] = None) -> None:
        """(Re)train k-means over live rows and lay out the block tensor.

        Synchronous — callers use it at bulk-load time; churn-triggered
        rebuilds go through the background maintenance path instead
        (:meth:`_maybe_rebuild`). Holds the engine lock for the duration."""
        with self._lock:
            t0 = time.perf_counter()
            c = self.config
            valid = self.store._np_valid
            n_live = int(valid.sum())
            if n_live < 16:
                return
            K = k or c.n_clusters or self._auto_k(n_live)
            K = min(K, n_live)
            dev = (
                self.store.device_view() if self._layout_on_device else None
            )
            cents, assign = train_kmeans(
                self.store._np_vectors, valid, K, n_iters=c.kmeans_iters,
                seed=c.seed,
                vectors_dev=None if dev is None else dev.vectors,
                valid_dev=None if dev is None else dev.valid,
                pace=self._pace if self._pace_s else None,
            )
            # cap clusters by SPLITTING (extra local centroids), never by
            # spilling rows to far clusters — spill caps recall (~0.95 on
            # clustered data) because probes can't reach spilled rows
            cmax = _cmax_shape(c.cmax_factor * max(n_live, 1) / K)
            cents, assign = split_oversized(
                self.store._np_vectors, cents, np.asarray(assign, np.int64),
                cmax, seed=c.seed,
            )
            # de-correlate cluster ids from space: split fragments are
            # spatially ADJACENT and consecutively numbered, but the
            # windowed probe selection (ops/ivf_kernels._select_probes)
            # keeps only the top-2 per 128-id window under the assumption
            # that ids partition space arbitrarily — without this shuffle a
            # query whose best clusters are sibling fragments loses all but
            # two of them (measured: lost self-recall on clustered corpora)
            perm = np.random.default_rng(c.seed + 1).permutation(len(cents))
            cents = cents[np.argsort(perm)]
            assign = np.where(assign >= 0, perm[assign], -1)
            cents, assign = self._prepare_clusters(cents, assign)
            self._centroids = cents
            self._cent_dev = self._put_cent_dev(cents)
            self._layout_from_assign(assign, len(cents), cmax=cmax)
            self._n_retrains += 1
            if c.recall_target is not None:
                self.tune_n_probe()
            self._last_rebuild_s = time.perf_counter() - t0

    def tune_n_probe(self, k: int = 10) -> Optional[int]:
        """Pick the smallest ``n_probe`` whose measured recall@``k`` on a
        held-out jittered sample meets ``config.recall_target``, and install
        it as the engine's serving value (VERDICT r3 next #5).

        Two passes. First a host-side estimate: the probe-inclusion recall
        curve — the fraction of each sample query's true top-k rows whose
        assigned cluster falls inside the query's first-P probes — computed
        from one [S, K] centroid-score matrix, simulating the same windowed
        top-2-per-128-lane selection the device kernel uses
        (ops/ivf_kernels._select_probes), with overflow rows counted found
        (the serving path merges them exactly). Then a measured check: real
        engine queries at the estimated pick against the exact-scan oracle,
        escalating while short of target (covers what the estimate can't —
        pair-cap drops, candidate-reduce approximation, bf16 noise).

        Recall is TIE-AWARE: a returned row counts when its true f64
        distance is within the oracle's k-th distance (+rel tol). Plain
        set-intersection recall saturates below ~0.95 on clustered corpora
        no matter how many probes run — near-ties at the boundary rank
        reorder under bf16 scoring — so tuning against it chases an
        unreachable target to the probe ceiling (measured: escalated to
        n_probe=64 at plain 0.939 on a corpus whose tie-aware recall was
        0.98 at n_probe=3, then OOMed the 65k-query serving batch).

        Returns the chosen value, or None when the corpus is too small to
        tune meaningfully (the configured n_probe stands)."""
        with self._lock:
            target = self.config.recall_target
            if target is None or not self._built:
                return None
            rows = np.flatnonzero(self.store._np_valid)
            S = min(self.config.recall_sample, len(rows))
            if len(rows) < 32 * k or S < 32:
                return None
            rng = np.random.default_rng(self.config.seed + 7)
            sample = rng.choice(rows, size=S, replace=False)
            base = self.store._np_vectors[sample]
            q = (
                base
                + self.config.recall_jitter
                * base.std(axis=0, keepdims=True)
                * rng.standard_normal(base.shape)
            ).astype(np.float32)
            # oracle: device exact f32 top-(4k) re-scored in f64 — the f32
            # scan can rank a near-tie wrong, and taking the k-th of ITS
            # top-k inflates the tie threshold (measured: holdout read
            # 1.6-5.9 pts above realized recall on the corpus-robustness
            # matrix, benches/bench_corpus_matrix.py, 2026-08-20). The k-th
            # of the f64-rescored deeper set is the true k-th distance.
            deep = min(max(4 * k, k + 32), len(rows))
            _, cand = ExactIndex(self.store).search_slots(q, deep)
            cand = np.asarray(cand)
            d_cand = self._host_dist_f64(q, cand)  # +inf for -1 slots
            order = np.argsort(d_cand, axis=1)
            d_sorted = np.take_along_axis(d_cand, order, axis=1)
            truth = np.take_along_axis(cand, order, axis=1)[:, :k]
            kth = d_sorted[:, k - 1]  # finite: the tuner gate requires
            # len(rows) >= 32*k >= deep live rows
            thr = kth * (1 + 1e-6) + 1e-12

            def tie_recall(got: np.ndarray) -> tuple[float, float]:
                """(mean, stderr) of per-query tie-aware recall@k."""
                d = self._host_dist_f64(q, got)
                ok = (got >= 0) & (d <= thr[:, None])
                per_q = np.minimum(ok.sum(axis=1), k) / k
                return float(per_q.mean()), float(
                    per_q.std() / np.sqrt(len(per_q))
                )

            p_max = min(self.config.n_probe_max, self.n_clusters)
            est = self._probe_inclusion_recall(q, truth, p_max)
            # smallest P whose estimated inclusion meets target (inclusion
            # upper-bounds engine recall, so start here and verify up)
            picks = np.flatnonzero(est >= target)
            p = int(picks[0]) + 1 if len(picks) else p_max
            history: list[tuple[int, float, float]] = []
            while True:
                self.config.n_probe = p
                _, got = self.search_slots(q, k)
                hit, err = tie_recall(np.asarray(got))
                history.append((p, hit, err))
                # accept only when the holdout LOWER bound (1 stderr) meets
                # target: a sample mean a hair over target passes configs
                # that realize under it (measured: near-dup family holdout
                # 0.9512 -> realized 0.948, bench_corpus_matrix 2026-08-20)
                if hit - err >= target or p >= p_max:
                    break
                if (
                    len(history) >= 2
                    and hit - history[-2][1] < max(0.5 * err, 1e-3)
                ):
                    # probe plateau: an escalation step that bought less
                    # than half a stderr will not reach target by probing
                    # more — the cap is elsewhere (scoring noise, pair-cap
                    # drops). Measured: the near-dup family sat at holdout
                    # 0.9512 from n_probe=9 all the way to the ceiling 64,
                    # serving 7x the probe work for nothing.
                    break
                p = min(p_max, max(p + 1, int(np.ceil(p * 1.5))))
            # serve the CHEAPEST measured probe count that met target, or —
            # when none did — the cheapest within half a stderr of the best
            # (a plateau walk should not install its last, priciest step)
            ok = [t for t in history if t[1] - t[2] >= target]
            if ok:
                p, hit, err = min(ok, key=lambda t: t[0])
            else:
                best_hit = max(h for _, h, _ in history)
                p, hit, err = min(
                    (t for t in history if t[1] >= best_hit - 0.5 * t[2]),
                    key=lambda t: t[0],
                )
            if hit - err < target and not self.config.rescore:
                # second tuning axis: exact f32 rescore of the survivor set
                # (IVFConfig.rescore) — bf16 block scoring caps recall on
                # near-duplicate-heavy corpora no matter the probe count
                # (rows ~1e-4 apart misrank under bf16's ~4e-3 noise);
                # rescore re-ranks survivors in f32 for ~6% QPS
                self.config.n_probe = p
                self.config.rescore = True
                _, got = self.search_slots(q, k)
                hit2, err2 = tie_recall(np.asarray(got))
                if hit2 - err2 >= target or hit2 - hit >= 0.005:
                    hit, err = hit2, err2
                else:
                    self.config.rescore = False
            self.config.n_probe = p
            self._tuned_n_probe = p
            self._tuned_recall = float(hit)
            self._tuned_stderr = float(err)
            return p

    @property
    def recall_shortfall(self) -> bool:
        """True when the recall-target tuner escalated to ``n_probe_max``
        and still measured short of ``config.recall_target`` (by more than
        half a point) — the corpus geometry defeats IVF pruning (uniform /
        heavy-tailed corpora: benches/bench_corpus_matrix.py). The hybrid
        layer routes such corpora to the exact engine; IVF alone keeps
        serving at its measured ceiling."""
        t = self.config.recall_target
        return (
            t is not None
            and self._tuned_recall is not None
            and self._tuned_recall < t - 0.005
        )

    def _host_dist_f64(self, q: np.ndarray, slots: np.ndarray) -> np.ndarray:
        """True f64 distances d(q[b], store[slots[b, j]]) -> f64[S, k],
        host-side, matching ops/distance semantics (guards included);
        slots < 0 get +inf. The tuner's tie arbiter."""
        from quiver_tpu.types import DistanceType

        metric = self.store.metric
        v = self.store._np_vectors[np.maximum(slots, 0)].astype(np.float64)
        qq = q.astype(np.float64)[:, None, :]
        if metric == DistanceType.MANHATTAN:
            d = np.abs(qq - v).sum(axis=2)
        else:
            dots = (qq * v).sum(axis=2)
            if metric == DistanceType.DOT_PRODUCT:
                d = 1.0 - dots
            elif metric == DistanceType.COSINE:
                qn = np.sqrt((qq * qq).sum(axis=2))
                vn = np.sqrt((v * v).sum(axis=2))
                nz = (qn > 0) & (vn > 0)
                sim = np.where(
                    nz, dots / np.maximum(qn * vn, 1e-30), 0.0
                )
                d = 1.0 - np.clip(sim, -1.0, 1.0)
            else:
                d2 = np.maximum(
                    (qq * qq).sum(axis=2) + (v * v).sum(axis=2) - 2.0 * dots,
                    0.0,
                )
                d = (
                    d2 if metric == DistanceType.SQUARED_EUCLIDEAN
                    else np.sqrt(d2)
                )
        return np.where(slots >= 0, d, np.inf)

    def _probe_inclusion_recall(
        self, q: np.ndarray, truth: np.ndarray, p_max: int
    ) -> np.ndarray:
        """est[P-1] = mean fraction of true top-k rows reachable with P
        probes, for P in 1..p_max — pure host math, no compiles."""
        c = self.config
        cents = self._centroids
        K = len(cents)
        # score centroids exactly the way the device probe_stage does
        # (ops/ivf_kernels.probe_stage): normalized dots for cosine, raw
        # dots for dot-product, the euclidean affine form otherwise — a
        # euclidean-only host estimate mis-simulates probe selection on
        # non-L2 corpora and can install a larger n_probe than needed
        # (ADVICE r4 #2)
        c_dots = q.astype(np.float32) @ cents.T
        c_ns = np.sum(
            cents.astype(np.float64) ** 2, axis=1, dtype=np.float64
        ).astype(np.float32)
        metric = self.store.metric
        if metric == DistanceType.COSINE:
            scores = c_dots / np.sqrt(np.maximum(c_ns, 1e-30))[None, :]
        elif metric == DistanceType.DOT_PRODUCT:
            scores = c_dots
        else:
            scores = 2.0 * c_dots - c_ns[None, :]
        if self._cluster_live is not None:
            scores = np.where(self._cluster_live[None, :], scores, -np.inf)
        S = len(q)
        nwin = (K + 127) // 128
        use_windowed = (
            c.probe_sel_approx is not None and K >= 256
        )
        if use_windowed:
            KP = nwin * 128
            sw = np.full((S, KP), -np.inf, np.float32)
            sw[:, :K] = scores
            sw = sw.reshape(S, nwin, 128)
            # top-2 per 128-id window, then rank window winners by score —
            # exactly the device kernel's candidate pool
            top2 = np.argpartition(-sw, 1, axis=2)[:, :, :2]
            wins_s = np.take_along_axis(sw, top2, axis=2).reshape(S, -1)
            wins_i = (
                np.arange(nwin)[None, :, None] * 128 + top2
            ).reshape(S, -1)
            order = np.argsort(-wins_s, axis=1, kind="stable")
            ranked_w = np.take_along_axis(wins_i, order, axis=1)
        order_e = np.argsort(-scores, axis=1, kind="stable")
        # cluster of each true top-k row; overflow/unplaced rows (cluster
        # -1) count as found — the serving path scans them exactly
        t_clust = np.where(truth >= 0, self._slot_pos[truth, 0], -2)
        k = truth.shape[1]
        est = np.empty(p_max, np.float64)
        found = np.zeros(truth.shape, bool) | (t_clust == -1)
        found_e = found.copy()
        for P in range(1, p_max + 1):
            # windowed branch applies while nwin >= P (the kernel's gate)
            ranked = (
                ranked_w if use_windowed and nwin >= P else order_e
            )
            newly = ranked[:, P - 1][:, None] == t_clust
            if use_windowed and nwin >= P:
                found |= newly
                est[P - 1] = found.mean()
            else:
                # fell back to the exact ranking: union over its prefix
                found_e |= (
                    order_e[:, :P, None] == t_clust[:, None, :]
                ).any(axis=1)
                est[P - 1] = (found_e | (t_clust == -1)).mean()
        return est

    def warmup(
        self,
        *,
        query_batches=(1, 256, 8192),
        write_batches=(256, 8192),
        k: int = 10,
    ) -> float:
        """Precompile the pow2 program ladder the serving mix will hit, so
        the first real query/write batch of each shape doesn't pay a cold
        XLA compile (30–120 s per novel shape over a remote link — VERDICT
        r3 next #9: first-batch inserts measured 244/s vs 26k/s steady).

        Query side runs the real serving program on zero queries (each
        batch size pads to its pow2 program shape). Write side runs the
        real assignment + block-scatter + keep-bit programs with every
        scatter row out of bounds (``mode="drop"``), so the layout is
        untouched. With JAX's persistent compilation cache (enabled in
        quiver_tpu/__init__), the work amortizes across processes too.
        Returns wall seconds spent."""
        t0 = time.perf_counter()
        with self._lock:
            if not self._built:
                return 0.0
            d = self.store.dim
            K = self._blocks_t.shape[0]
            outs = []
            for b in query_batches:
                m = _pow2(max(int(b), 8))
                outs.append(
                    self.search_slots_device(jnp.zeros((m, d)), k)
                )
            for b in write_batches:
                m = _pow2(max(int(b), 8))
                self._assign_slots(np.zeros(m, np.int64))
                # all-dropped scatter: compiles + executes the real write
                # program, changes nothing
                self._scatter_block_rows(
                    np.full(m, K, np.int32), np.zeros(m, np.int32),
                    np.full(m, -1, np.int64),
                )
                self._keep_pending.extend(
                    (K, i, False) for i in range(m)  # row K: dropped
                )
                outs.append(self._keep_dev())
            jax.block_until_ready(outs)
        return time.perf_counter() - t0

    def _prepare_clusters(self, cents, assign):
        """Hook: remap (centroids, assignment) into the engine's cluster
        id space before layout. The sharded engine pads/renumbers ids so
        each shard owns a contiguous block plus one reserved empty
        cluster (parallel/sharded_ivf.py); single-chip is identity."""
        self._cluster_live = None
        return cents, assign

    def _put_cent_dev(self, cents: np.ndarray):
        """Hook: place (centroids, |c|^2) on device (sharded: replicated
        over the mesh)."""
        cent_j = jnp.asarray(cents)
        return cent_j, jnp.sum(cent_j * cent_j, axis=1)

    def _put_block_arrays(self, blocks_t, block_slot, rns, inv, keep):
        """Hook: place the block arrays on device (sharded: cluster axis
        partitioned over the mesh — parallel/sharded_ivf.py)."""
        return (
            jnp.asarray(blocks_t), jnp.asarray(block_slot),
            jnp.asarray(rns), jnp.asarray(inv), jnp.asarray(keep),
        )

    def _assign_scores(self, vectors: np.ndarray) -> np.ndarray:
        """Nearest-centroid affine scores for write-path assignment, with
        reserved cluster ids masked out."""
        cent_j, c_ns = self._cent_dev
        scores = 2.0 * (jnp.asarray(vectors) @ cent_j.T) - c_ns[None, :]
        if self._cluster_live is not None:
            scores = jnp.where(
                jnp.asarray(self._cluster_live)[None, :], scores, -np.inf
            )
        return np.asarray(scores)

    def _np_compute_dtype(self):
        return np.dtype(jnp.dtype(self.compute_dtype).name)

    def _assign_nearest(
        self, vectors: np.ndarray, chunk: int = 1 << 16,
        return_scores: bool = False,
    ):
        """Nearest live-centroid id per row (optionally with the winning
        affine score), row-chunked so the [chunk, K] score tensor stays
        bounded on device (the full [N, K] matrix is ~8 GB at 1M rows x 2k
        clusters); the tail chunk pads to the same compiled shape."""
        cent_j, c_ns = self._cent_dev
        K = cent_j.shape[0]
        live = jnp.asarray(
            np.ones(K, bool)
            if self._cluster_live is None
            else np.asarray(self._cluster_live, bool)
        )
        n = len(vectors)
        chunk = min(chunk, _pow2(max(n, 8)))
        out = np.empty(n, np.int64)
        scores = np.empty(n, np.float32) if return_scores else None
        for at in range(0, n, chunk):
            v = np.asarray(vectors[at: at + chunk], np.float32)
            m = len(v)
            if m < chunk:
                v = np.concatenate(
                    [v, np.zeros((chunk - m, v.shape[1]), np.float32)]
                )
            a, s = _nearest_centroid(jnp.asarray(v), cent_j, c_ns, live)
            out[at: at + m] = np.asarray(a)[:m]
            if return_scores:
                scores[at: at + m] = np.asarray(s)[:m]
            self._pace()
        return (out, scores) if return_scores else out

    def _assign_nearest_slots(
        self, slots: np.ndarray, chunk: int = 1 << 16,
    ):
        """(nearest live-centroid id, winning affine score) for store rows
        by SLOT, row-chunked like :meth:`_assign_nearest` — but gathering
        from the store's device copy, so a full-corpus refresh uploads
        only the slot indices (512 MB -> 8 MB at 1M x 128-d over the
        tunnel; PCIe-bound co-located hosts save proportionally)."""
        vectors, _ = self._gather_source()
        cent_j, c_ns = self._cent_dev
        K = cent_j.shape[0]
        live = jnp.asarray(
            np.ones(K, bool)
            if self._cluster_live is None
            else np.asarray(self._cluster_live, bool)
        )
        n = len(slots)
        chunk = min(chunk, _pow2(max(n, 8)))
        out = np.empty(n, np.int64)
        scores = np.empty(n, np.float32)
        for at in range(0, n, chunk):
            s = np.zeros(chunk, np.int64)
            m = min(chunk, n - at)
            s[:m] = slots[at: at + m]
            a, sc = _nearest_centroid_slots(
                jnp.asarray(s), vectors, cent_j, c_ns, live
            )
            out[at: at + m] = np.asarray(a)[:m]
            scores[at: at + m] = np.asarray(sc)[:m]
            self._pace()
        return out, scores

    def refresh(self) -> None:
        """Re-layout every live row against the EXISTING centroids — no
        k-means retrain, no cluster split: one chunked nearest-centroid
        assignment plus the deterministic block layout. Absorbs the
        exact-scanned overflow set, tombstoned block positions and update
        fragmentation at a fraction of :meth:`build`'s wall, and keeps the
        centroid set / cluster id space / cmax unchanged — so the sharded
        engine's ownership layout stays valid (parallel/sharded_ivf.py
        renumbers cluster ids only inside build). Rows that land in a full
        cluster spill to their nearest cluster with room
        (ops/ivf_kernels.balance_assignment); escalates to a full build
        when the corpus outgrew the centroids (not enough total room, or a
        spill fraction that would turn into recall loss)."""
        with self._lock:
            if not self._built or self._centroids is None:
                return self.build()
            valid = self.store._np_valid
            rows = np.flatnonzero(valid)
            n_live = len(rows)
            if n_live < 16:
                self._built = False
                return
            K = len(self._centroids)
            cmax = int(self._cmax)
            n_live_clusters = (
                K if self._cluster_live is None
                else int(self._cluster_live.sum())
            )
            if n_live > n_live_clusters * cmax:
                return self.build()  # no room even w/ spill: resize/retrain
            if self._layout_on_device:
                # gather from the device corpus copy: slots upload, not rows
                a, best_s = self._assign_nearest_slots(rows)
                vecs = self.store._np_vectors[rows]  # host-only drift stat
            else:
                vecs = self.store._np_vectors[rows]
                a, best_s = self._assign_nearest(vecs, return_scores=True)
            # per-row drift router (same criterion as on_insert): rows the
            # trained centroids can't represent stay in the exact-scanned
            # overflow set — placing them in their "nearest" block would
            # hide them from the probes a query near them selects
            drift = self._drift_mask(vecs, best_s)
            if drift.sum() > self.config.drift_rebuild * n_live:
                return self.build()  # drift-heavy: only a retrain drains it
            drift_slots = rows[drift]
            if drift.any():
                rows, a, vecs = rows[~drift], a[~drift], vecs[~drift]
                best_s = best_s[~drift]
                n_live = len(rows)
                if n_live < 16:
                    return self.build()
            assign = np.full(self.store.capacity, -1, np.int64)
            assign[rows] = a
            counts = np.bincount(a, minlength=K)
            spill = int(np.maximum(counts - cmax, 0).sum())
            if spill > 0.02 * n_live:
                return self.build()  # heavy overflow: centroids are stale
            # drift detector: |v - c*|^2 = |v|^2 - best affine score; a mean
            # squared residual far above the at-build value means the stream
            # shifted away from the trained centroids (refresh would
            # silently cap recall — the probes nearest a drifted query scan
            # wrong blocks)
            vns = np.sum(vecs.astype(np.float64) ** 2, axis=1)
            resid_ms = float(np.mean(np.maximum(vns - best_s, 0.0)))
            if self._built_resid is not None and resid_ms > (
                self.config.refresh_drift * max(self._built_resid, 1e-12)
                + 1e-9
            ):
                return self.build()
            base = self._built_resid
            self._layout_from_assign(assign, K, cmax=cmax)
            # the drift baseline belongs to the TRAINED centroids:
            # successive refreshes must not ratchet it up (slow drift
            # would escape)
            self._built_resid = base
            if len(drift_slots):
                self._overflow.update(int(s) for s in drift_slots)
                self._drift.update(int(s) for s in drift_slots)
            self._n_refreshes += 1

    def _maybe_rebuild(self) -> None:
        if self._staging:
            return  # maintenance clones never recurse into maintenance
        c = self.config
        if not self._built:
            # initial build is a bulk-load moment, not a serving-path
            # stall: stay synchronous (queries fall back to the exact scan
            # until built either way)
            if self.store.size >= c.build_threshold:
                self.build()
            return
        if not self._built_size:
            return
        ratio = self._churn / max(self._built_size, 1)
        if (
            ratio > c.retrain_growth
            # drift-routed rows can only be drained by NEW centroids —
            # refresh re-lays-out against the same ones and keeps them in
            # overflow, so a drift-heavy overflow goes straight to retrain
            or len(self._drift) > c.drift_rebuild * self._built_size
        ):
            kind = "build"
        elif (
            ratio > c.rebuild_growth
            # spill overflow (full clusters) is what a re-layout reclaims;
            # drift rows don't count toward the refresh trigger or every
            # write past the drift threshold would re-trigger a refresh
            # that cannot shrink the set
            or (len(self._overflow) - len(self._drift))
            > 0.05 * self._built_size
        ):
            kind = "refresh"
        else:
            return
        if not c.background_maintenance:
            (self.build if kind == "build" else self.refresh)()
            return
        self._submit_maintenance(kind)

    # ------------------------------------------------- background maintenance

    def _submit_maintenance(self, kind: str) -> None:
        """Queue a churn-triggered rebuild on the maintenance thread. One
        job runs at a time; a second trigger while one is in flight queues
        (and a queued refresh upgrades to a retrain, never the reverse)."""
        with self._lock:
            if self._maint_thread is not None and self._maint_thread.is_alive():
                if kind == "build" or self._maint_pending == "build":
                    self._maint_pending = "build"
                else:
                    self._maint_pending = self._maint_pending or kind
                return
            t = threading.Thread(
                target=self._maintenance_job, args=(kind,),
                name="ivf-maintenance", daemon=True,
            )
            self._maint_thread = t
            t.start()

    def wait_maintenance(self, timeout: Optional[float] = None) -> bool:
        """Block until no maintenance job runs or queues (True), or the
        timeout lapses (False). Benches/tests use this to make background
        rebuilds deterministic; serving code never needs it."""
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            with self._lock:
                t = self._maint_thread
                if t is None and self._maint_pending is None:
                    return True
            if t is None:
                time.sleep(0.005)
            else:
                t.join(
                    None if deadline is None
                    else max(deadline - time.monotonic(), 0.0)
                )
            if deadline is not None and time.monotonic() >= deadline:
                with self._lock:
                    return (
                        self._maint_thread is None
                        and self._maint_pending is None
                    )

    def _maintenance_job(self, kind: str) -> None:
        ok = False
        try:
            self._run_maintenance(kind)
            ok = True
        except Exception as e:  # noqa: BLE001 — background thread boundary
            self._maint_error = repr(e)
        finally:
            # clear-and-re-evaluate under ONE lock acquisition, so a waiter
            # can never observe (no thread, no pending) while a queued job
            # is still owed a thread. Triggers that fired DURING the job
            # re-check against the POST-swap counters (the swap reset the
            # churn they measured) instead of unconditionally paying a
            # second full rebuild; on failure nothing re-submits — churn
            # was not reset, so the next write re-triggers naturally.
            with self._lock:
                if ok:
                    self._maint_error = None
                self._maint_thread = None
                pending, self._maint_pending = self._maint_pending, None
                if pending is not None and ok:
                    self._maybe_rebuild()

    def _run_maintenance(self, kind: str) -> None:
        """Double-buffered rebuild: build the next layout into a staging
        clone from a store snapshot, catch up with writes that landed
        meanwhile via the store's change feed (lock-free while the delta is
        big), then take the engine lock for one final small replay and the
        atomic field swap. Write calls stall only for that last replay
        (bounded by _LOCKED_REPLAY_MAX rows); queries keep serving the old
        layout — which also absorbed every write — throughout."""
        for _attempt in range(4):
            gen0 = self._layout_gen
            cursor, _ = self.store.changes_since(None)
            eng = self._make_staging(kind)
            if kind == "build" or not eng._built:
                eng.build()
            else:
                eng.refresh()  # may escalate to build() internally
            if not eng._built:
                return  # corpus shrank below viability; exact path serves
            # pre-warm the staging layout's serve + write programs at the
            # shapes the serving engine dispatches, BEFORE the swap: a
            # grown corpus changes the block geometry (Cmax, sometimes K),
            # and without this the first post-swap query pays the new
            # shape's cold XLA compile mid-stream (VERDICT r4 #6 — QPS
            # dipped 6.5x across a growth rebuild). The compile runs on
            # this maintenance thread against the staging arrays; the old
            # layout keeps serving warm programs throughout.
            self._warm_staging(eng)
            restart = False
            while True:
                cursor, delta = self.store.changes_since(cursor)
                if delta is None:
                    restart = True  # capacity growth / feed overflow
                    break
                if len(delta) > _LOCKED_REPLAY_MAX:
                    self._replay_into(eng, delta)
                    continue
                t0 = time.perf_counter()
                with self._lock:
                    if self._layout_gen != gen0:
                        return  # an explicit build/import superseded us
                    cursor, delta2 = self.store.changes_since(cursor)
                    if delta2 is None:
                        restart = True
                    else:
                        if len(delta2):
                            delta = np.union1d(delta, delta2)
                        self._replay_into(eng, delta)
                        self._adopt(eng)
                        self._maint_last_stall_s = time.perf_counter() - t0
                if not restart:
                    return
                break

    def _warm_staging(self, eng: "IVFIndex") -> None:
        """Compile the staging layout's query/write programs at the
        serving mix's shapes (best-effort — a failed warm costs a
        post-swap compile, never the rebuild)."""
        try:
            with self._lock:
                shapes = sorted(self._served_shapes)
            d = self.store.dim
            outs = []
            for bq, kq in shapes:
                outs.append(
                    eng.search_slots_device(jnp.zeros((bq, d)), kq)
                )
            # write side: the replay/ingest programs at the locked-replay
            # bound (all rows dropped — layout untouched)
            m = _pow2(min(_LOCKED_REPLAY_MAX, 256))
            eng._assign_slots(np.zeros(m, np.int64))
            K = eng._blocks_t.shape[0]
            eng._scatter_block_rows(
                np.full(m, K, np.int32), np.zeros(m, np.int32),
                np.full(m, -1, np.int64),
            )
            jax.block_until_ready(outs)
        except Exception:  # noqa: BLE001 — warm-up must never kill a swap
            pass

    #: layout fields transplanted wholesale at swap time
    _ADOPT_FIELDS = (
        "_centroids", "_cent_dev", "_cluster_live", "_blocks_t",
        "_block_slot", "_block_ns", "_block_inv", "_block_keep",
        "_keep_pending", "_fill", "_built_resid", "_slot_pos", "_overflow",
        "_drift", "_built", "_built_size", "_churn", "_cmax",
        "_tuned_n_probe", "_tuned_recall", "_tuned_stderr",
    )
    #: subclass state copied into refresh clones and back at adoption
    #: (sharded adds its cluster-ownership geometry)
    _CLONE_EXTRA: tuple = ()

    def _clone_for_maintenance(self) -> "IVFIndex":
        """Hook: a fresh engine of the same class over the same store, used
        as the staging target for background rebuilds. The clone gets a
        COPIED config: tune_n_probe escalation inside a staging build
        assigns config.n_probe, and a shared object would thrash the
        serving path's probe count (and its jit cache) mid-rebuild — the
        tuned value installs atomically at _adopt instead."""
        return type(self)(
            self.store, config=dataclasses.replace(self.config),
            compute_dtype=self.compute_dtype,
        )

    def _pace(self) -> None:
        """Cooperative yield between maintenance device dispatches (no-op
        unless this engine is a staging clone with a configured pace)."""
        if self._pace_s:
            time.sleep(self._pace_s)

    def _make_staging(self, kind: str) -> "IVFIndex":
        eng = self._clone_for_maintenance()
        eng._staging = True
        eng._pace_s = float(self.config.maint_pace_s or 0.0)
        if kind != "build":
            with self._lock:
                # refresh reuses the trained centroids and layout geometry;
                # everything here is immutable or replaced-not-mutated, so
                # sharing references with the serving engine is safe (the
                # block tensors are NOT shared — the write path donates
                # them to XLA, and a shared donation would invalidate the
                # serving copy)
                eng._centroids = self._centroids
                eng._cent_dev = self._cent_dev
                eng._cluster_live = self._cluster_live
                eng._cmax = self._cmax
                eng._built_resid = self._built_resid
                eng._built = self._built
                for f in self._CLONE_EXTRA:
                    setattr(eng, f, getattr(self, f))
        return eng

    def _replay_into(self, eng: "IVFIndex", slots: np.ndarray) -> None:
        """Bring a staging layout up to date with store mutations that
        landed after its snapshot: vacate every touched slot, then
        re-insert the live ones through the normal write path. Idempotent —
        a slot replayed here AND written by a racing writer after the swap
        resolves to one block entry (on_insert vacates first)."""
        slots = np.asarray(slots, np.int64)
        slots = slots[slots < eng.store.capacity]
        if not eng._built or not len(slots):
            return
        # chunked + paced: a catch-up delta can be a third of the corpus,
        # and one on_insert over it dispatches proportionally large
        # assign/scatter programs that stall concurrent serving queries
        ch = 1 << 15
        for at in range(0, len(slots), ch):
            sl = slots[at: at + ch]
            vecs, valid = self.store.read_rows(sl)
            with eng._lock:
                eng._grow_maps()
                eng._vacate_slots(sl)
                if valid.any():
                    eng.on_insert(sl[valid], vecs[valid])
            eng._pace()

    def _adopt(self, eng: "IVFIndex") -> None:
        """Install a staging clone's layout as the serving layout (caller
        holds the engine lock)."""
        for f in self._ADOPT_FIELDS + self._CLONE_EXTRA:
            setattr(self, f, getattr(eng, f))
        # the staging build's tuner ran against the staging config copy;
        # its pick takes effect here, atomically with the layout it was
        # measured on (never on the old layout mid-rebuild)
        if eng._tuned_n_probe is not None:
            self.config.n_probe = eng.config.n_probe
        self._n_retrains += eng._n_retrains
        self._n_refreshes += eng._n_refreshes
        if eng._n_retrains or eng._n_refreshes:
            self._last_rebuild_s = eng._last_rebuild_s
        self._layout_gen += 1
        self._maint_swaps += 1

    # ------------------------------------------------------------- write API

    def on_insert(self, slots: np.ndarray, vectors: np.ndarray) -> None:
        slots = np.asarray(slots, np.int64)
        vectors = np.asarray(vectors, np.float32)
        with self._lock:
            if not self._built:
                self._maybe_rebuild()
                return
            self._grow_maps()
            # idempotent: re-inserting a slot the layout already holds (a
            # swap replay racing the writer that produced the same slot)
            # must not double-represent it
            pos0 = self._slot_pos[slots]
            if (pos0[:, 0] >= 0).any() or (
                self._overflow
                and not self._overflow.isdisjoint(int(s) for s in slots)
            ):
                self._vacate_slots(slots)
            # assign to nearest centroid (one matmul); place each row at
            # its cluster's next free position — vectorized: sort by
            # cluster, rank within the batch's cluster-runs, offset by the
            # current fill (the former per-row Python loop was the
            # write-path bottleneck, VERDICT r2 weak #8)
            assign, best_s = self._assign_slots(slots)
            n_in = len(slots)
            drift = self._drift_mask(vectors, best_s)
            if drift.any():
                ds = slots[drift]
                self._overflow.update(int(s) for s in ds)
                self._drift.update(int(s) for s in ds)
                slots, assign = slots[~drift], assign[~drift]
            cmax = self._block_slot.shape[1]
            order = np.argsort(assign, kind="stable")
            sorted_a = assign[order]
            n = len(order)
            if n:
                is_start = np.concatenate(
                    [[True], sorted_a[1:] != sorted_a[:-1]]
                )
                start = np.maximum.accumulate(
                    np.where(is_start, np.arange(n), 0)
                )
                pos = self._fill[sorted_a] + (np.arange(n) - start)
                fits = pos < cmax
                app_rows = sorted_a[fits].astype(np.int32)
                app_pos = pos[fits].astype(np.int32)
                app_slots = slots[order][fits]
                self._fill += np.bincount(app_rows, minlength=len(self._fill))
                self._slot_pos[app_slots, 0] = app_rows
                self._slot_pos[app_slots, 1] = app_pos
                self._overflow.update(int(s) for s in slots[order][~fits])
                self._keep_pending.extend(
                    (int(a), int(p), True) for a, p in zip(app_rows, app_pos)
                )
                if len(app_rows):
                    self._scatter_block_rows(app_rows, app_pos, app_slots)
            self._churn += n_in
            self._maybe_rebuild()

    def _vacate_slots(self, slots: np.ndarray) -> None:
        """Remove slots from the block layout: keep-bit tombstones for the
        positions held (lazy scatter, same as on_delete) plus map/overflow
        resets. No-op for slots the layout doesn't hold. Caller holds the
        engine lock. Vacated positions are reclaimed at the next
        re-layout, not reused in place (fill only grows; churn accounting
        covers the waste)."""
        pos = self._slot_pos[slots]
        known = pos[:, 0] >= 0
        if known.any():
            self._keep_pending.extend(
                (int(r), int(p), False) for r, p in pos[known]
            )
        self._slot_pos[slots] = -1
        self._overflow.difference_update(int(s) for s in slots)
        self._drift.difference_update(int(s) for s in slots)

    def _gather_source(self):
        """(vectors, norms_sq) device arrays the write path gathers rows
        from. The sharded engine overrides this with its mesh-sharded
        corpus copy so the write-path programs see mesh-consistent operand
        placements."""
        view = self.store.device_view()
        return view.vectors, view.norms_sq

    def _assign_slots(self, slots_np: np.ndarray):
        """(assign, best_score) of the nearest live centroid for store rows
        by SLOT: the vector data is gathered from the store's device copy
        (already synced by ``add_batch``/``update_batch``), so only the
        slot indices upload and only two small vectors download. The score
        is the euclidean affine form 2 v.c - |c|^2, whose gap to |v|^2 is
        the squared residual the drift router thresholds."""
        vectors, _ = self._gather_source()
        cent_j, c_ns = self._cent_dev
        K = cent_j.shape[0]
        live = jnp.asarray(
            np.ones(K, bool)
            if self._cluster_live is None
            else np.asarray(self._cluster_live, bool)
        )
        m = _pow2(max(len(slots_np), 8))
        ps = np.zeros(m, np.int64)
        ps[: len(slots_np)] = slots_np
        a, s = _nearest_centroid_slots(
            jnp.asarray(ps), vectors, cent_j, c_ns, live
        )
        n = len(slots_np)
        return (
            np.asarray(a)[:n].astype(np.int64),
            np.asarray(s)[:n].astype(np.float64),
        )

    def _drift_mask(
        self, vectors: np.ndarray, best_s: np.ndarray
    ) -> np.ndarray:
        """True for rows the trained centroids can't represent: squared
        residual |v - c*|^2 = |v|^2 - best affine score above
        ``insert_drift`` x the at-build mean. Such rows route to the
        exact-scanned overflow set (see IVFConfig.insert_drift)."""
        f = self.config.insert_drift
        if f is None or not self._built_resid or self._built_resid <= 0:
            return np.zeros(len(vectors), bool)
        vns = np.sum(vectors.astype(np.float64) ** 2, axis=1)
        resid = np.maximum(vns - best_s, 0.0)
        return resid > f * self._built_resid

    def _scatter_block_rows(self, rows_np, pos_np, slots_np) -> None:
        """Scatter store rows (by slot) into the block arrays — one jitted
        program (_scatter_blocks_dev): the rows gather from the store's
        device copy and the residuals/stats compute on device, so a write
        batch uploads three small index vectors instead of re-shipping the
        vector data, and the former eager ``.at[].set`` chain's four
        dispatch round trips collapse to one.

        Indices pad to a pow2 length with OOB rows (mode="drop"): a fresh
        index shape per call would be a fresh XLA program — ~6.7 s of
        remote compile per write batch on the tunnel (the same trap the
        HNSW build hit, hnsw._Layer.device)."""
        K = self._blocks_t.shape[0]
        m = _pow2(max(len(rows_np), 8))
        rp = np.full(m, K, np.int32)
        rp[: len(rows_np)] = rows_np
        pp = np.zeros(m, np.int32)
        pp[: len(pos_np)] = pos_np
        sp = np.full(m, -1, np.int64)
        sp[: len(slots_np)] = slots_np
        vectors, norms = self._gather_source()
        cent_j, _ = self._cent_dev
        (
            self._blocks_t,
            self._block_ns,
            self._block_inv,
            self._block_slot,
        ) = _scatter_blocks_dev(
            self._blocks_t,
            self._block_ns,
            self._block_inv,
            self._block_slot,
            vectors,
            norms,
            cent_j,
            jnp.asarray(rp),
            jnp.asarray(pp),
            jnp.asarray(sp),
        )

    def on_update(self, slots: np.ndarray, vectors: np.ndarray) -> None:
        slots = np.asarray(slots, np.int64)
        vectors = np.asarray(vectors, np.float32)
        with self._lock:
            if not self._built:
                return
            self._grow_maps()
            # re-assign: a vector whose nearest centroid changed moves
            # blocks (in-place refresh would leave it invisible to the
            # right probes); a vector that drifted past the centroids'
            # reach moves to overflow via the on_insert router below
            new_assign, best_s = self._assign_slots(slots)
            drift = self._drift_mask(vectors, best_s)
            pos = self._slot_pos[slots]
            known = pos[:, 0] >= 0
            stay = known & (pos[:, 0] == new_assign) & ~drift
            moved = ~stay
            if stay.any():
                self._scatter_block_rows(
                    pos[stay, 0].astype(np.int32),
                    pos[stay, 1].astype(np.int32),
                    slots[stay],
                )
            if moved.any():
                # vacate the old block entry, then append as a fresh insert
                self._vacate_slots(slots[moved])
                self.on_insert(slots[moved], vectors[moved])
            self._churn += len(slots)
            self._maybe_rebuild()

    def on_delete(self, slots: np.ndarray) -> None:
        # mark the block positions dead and forget them — the store may
        # reuse the slot for a fresh vector, and a slot-addressed validity
        # mask would then resurrect the STALE block entry (old vector,
        # duplicate slot in results)
        slots = np.asarray(slots, np.int64)
        with self._lock:
            if self._built:
                self._vacate_slots(slots)
            else:
                self._overflow.difference_update(int(s) for s in slots)
                self._drift.difference_update(int(s) for s in slots)
            self._churn += len(slots)
            self._maybe_rebuild()

    def _keep_dev(self):
        """Apply pending keep-bit scatters (one dispatch per query batch at
        most — write paths only queue host-side tuples). Caller holds the
        engine lock."""
        if self._keep_pending:
            # last write wins per position (scatter order with duplicate
            # indices is undefined; insert-then-delete of one slot in the
            # same window would race otherwise). Scatter pads to pow2 so
            # the XLA program shape is stable (OOB pad rows drop).
            last = {(r, c): v for r, c, v in self._keep_pending}
            m = _pow2(max(len(last), 8))
            K = self._block_keep.shape[0]
            rows = np.full(m, K, np.int32)
            cols = np.zeros(m, np.int32)
            vals = np.zeros(m, bool)
            rows[: len(last)] = [rc[0] for rc in last]
            cols[: len(last)] = [rc[1] for rc in last]
            vals[: len(last)] = list(last.values())
            self._block_keep = self._block_keep.at[
                jnp.asarray(rows), jnp.asarray(cols)
            ].set(jnp.asarray(vals), mode="drop")
            self._keep_pending = []
        return self._block_keep

    def _grow_maps(self) -> None:
        cap = self.store.capacity
        if self._slot_pos is not None and len(self._slot_pos) < cap:
            extra = cap - len(self._slot_pos)
            self._slot_pos = np.concatenate(
                [self._slot_pos, np.full((extra, 2), -1, np.int64)]
            )

    # ---------------------------------------------------------------- query

    def _q_cap(self, B: int, P: int, K: int) -> int:
        # expected pairs per cluster = B*P/K, times a skew-headroom factor
        # (beyond the cap, overflow pairs drop — ivf_query docstring)
        f = self.config.q_cap_factor
        return _pow2(
            max(8, int(np.ceil(f * B * P / K))), lo=8, hi=min(1024, _pow2(B))
        )

    def search_slots_device(self, queries, k: int, *, mask=None):
        """Device-resident serving path: jax-array queries in (batch padded
        to a compiled shape by the caller), (dist, slot) jax arrays out,
        ZERO host syncs — the overflow merge, under-fill supplement and
        negative rerank of :meth:`search_slots` are host-side conveniences
        layered on top of this. Used by the pipelined serving benches
        (dispatch many batches, fetch the last — the only timing that
        survives a remote-dispatch link) and by callers that keep results
        on device.

        Holds the engine lock across the host preamble + dispatch (the
        dispatch is asynchronous — the lock is NOT held while the device
        computes), so a concurrent maintenance swap can't tear the layout
        mid-read."""
        with self._lock:
            if not self._built:
                raise RuntimeError("IVF index is not built")
            dev = self.store.device_view()
            block_keep = self._keep_dev()
            if mask is not None:
                block_keep = _mask_block_keep(
                    block_keep, self._block_slot, mask
                )
            cent_j, c_ns = self._cent_dev
            K = cent_j.shape[0]
            P = min(self.config.n_probe, K)
            form, interp = self._resolve_formulation(k)
            if len(self._served_shapes) < 64:  # bounded; serving mixes
                self._served_shapes.add((int(queries.shape[0]), int(k)))
            return ivf_query(
                queries, cent_j, c_ns,
                self._blocks_t, self._block_slot, self._block_ns,
                self._block_inv, block_keep, dev.vectors,
                metric=self._metric(), k=k, n_probe=P,
                # q_cap only parameterizes the einsum formulation; pinning
                # it elsewhere avoids spurious jit-cache keys as B varies
                q_cap=(
                    self._q_cap(queries.shape[0], P, K)
                    if form == "einsum" else 8
                ),
                compute_dtype=self.compute_dtype,
                oversample=self.config.oversample,
                probe_approx=self.config.probe_approx,
                probe_sel_approx=self.config.probe_sel_approx,
                formulation=form,
                seg_width=self.config.seg_width,
                rescore=self.config.rescore,
                fused_interpret=interp,
                fused_kg=self.config.fused_kg,
            )

    def _resolve_formulation(self, k: int):
        """("fused"|"einsum"|"pairs", interpret) — "auto" resolves to the
        ragged pairs path (the measured winner); an explicit "fused" on
        a non-TPU backend runs in pallas interpret mode (tests)."""
        form = self.config.formulation
        if form == "pairs" or form == "einsum":
            return form, False
        from quiver_tpu.ops.ivf_pallas import R_WIN, WIN

        Cmax = int(self._block_slot.shape[1])
        S = Cmax // WIN
        shapes_ok = (
            Cmax % WIN == 0 and R_WIN * S >= k and R_WIN * S <= 128
            and Cmax <= 2048
            and self.store.metric in (
                DistanceType.EUCLIDEAN, DistanceType.SQUARED_EUCLIDEAN,
                DistanceType.DOT_PRODUCT,
            )
        )
        on_tpu = jax.default_backend() not in ("cpu",)
        if form == "fused":
            if not shapes_ok:
                raise ValueError(
                    "fused formulation unsupported here: needs euclidean/"
                    "dot metric, Cmax % 128 == 0, 4*(Cmax//128) in "
                    "[k, 128], Cmax <= 2048"
                )
            return "fused", not on_tpu
        # auto: the ragged pairs path wins on TPU (benches/lab_pairs2.py:
        # 10.7 ms vs einsum's 27.6 ms at the 1M serving shape, recall
        # 0.9805 vs 0.977 — no q_cap drops) and is drop-free at every
        # shape. The fused Pallas kernel stays opt-in: it wins 5-25% at
        # mid-batch shapes (B=2048-8192, benches/exp_fused_ab.py
        # 2026-08-19) but loses 1.4-1.6x at the 65k headline batch and
        # hits an SMEM bound past B*n_probe ~200k — pin
        # formulation="fused" for fixed mid-size serving batches.
        return "pairs", False

    def search_slots(
        self,
        queries,
        k: int,
        *,
        mask=None,
        negative=None,
        negative_weight: float = 0.5,
        exact: bool = False,
    ):
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[0] == 0:
            return (
                np.zeros((0, k), np.float32), np.full((0, k), -1, np.int64)
            )
        per_query_mask = mask is not None and np.asarray(mask).ndim == 2
        if (
            exact
            or not self._built
            or per_query_mask
            or self.store.metric == DistanceType.MANHATTAN
            or self.store.size < self.config.build_threshold // 4
        ):
            return self._exact.search_slots(
                q, k, mask=mask, negative=negative,
                negative_weight=negative_weight,
            )
        # pad batch to pow2 (stable compiled shapes) by REPEATING the first
        # query: zero rows would all probe the same clusters, concentrating
        # the sharded engine's local-pair load on one shard
        B0 = q.shape[0]
        Bp = _pow2(B0, lo=8)
        if Bp != B0:
            q = np.concatenate(
                [q, np.broadcast_to(q[:1], (Bp - B0, q.shape[1]))]
            )
        retrieve_k = k if negative is None else min(max(2 * k, 30), self.store.size)
        with self._lock:
            dist, idx = self.search_slots_device(
                jnp.asarray(q), retrieve_k,
                mask=None if mask is None else jnp.asarray(
                    np.asarray(mask, bool)
                ),
            )
            # snapshot the overflow set atomically with the dispatch: a
            # maintenance swap between dispatch and fetch would otherwise
            # pair the OLD layout's results with the NEW (empty) overflow
            # set and drop the spilled rows from this batch's results
            overflow = sorted(self._overflow) if self._overflow else None
        # one overlapped fetch (≈1 link RTT for both arrays), then slice the
        # pad rows off host-side; fetch_np returns writable copies so the
        # merge paths below can edit rows in place
        dist, idx = fetch_np(dist, idx)
        dist, idx = dist[:B0], idx[:B0]
        if overflow:
            slot_keep = self.store._np_valid.copy()
            if mask is not None:
                slot_keep &= np.asarray(mask, bool)
            dist, idx = self._merge_overflow(
                q[:B0], dist, idx, slot_keep, retrieve_k, overflow
            )
        if negative is not None:
            dist, idx = self._rerank_negative(
                q[:B0], dist, idx, negative, negative_weight, k
            )
        dist, idx = dist[:, :k], idx[:, :k]
        # under-fill supplement: probed clusters may not hold k live rows
        found = (idx >= 0).sum(axis=1)
        want = min(k, self.store.size)
        if (found < want).any():
            e_dist, e_idx = self._exact.search_slots(
                q[:B0], k, mask=mask, negative=negative,
                negative_weight=negative_weight,
            )
            from quiver_tpu.index.hnsw import _merge_rows

            for b in np.flatnonzero(found < want):
                dist[b], idx[b] = _merge_rows(
                    dist[b], idx[b], e_dist[b], e_idx[b], k
                )
        return dist, idx

    def _rerank_negative(self, q, dist, idx, negative, weight, k):
        """Negative-example rerank of retrieved candidates (reference
        formula d_q - w*d_neg, pkg/hnsw/adapter.go:417-421). Sharded
        engines override to keep the corpus row gather in-mesh."""
        neg = np.asarray(negative, np.float32)
        if neg.ndim == 1:
            neg = np.broadcast_to(neg[None, :], q.shape)
        d2, i2 = negative_rerank(
            jnp.asarray(dist), jnp.asarray(idx),
            self.store.device_view().vectors,
            jnp.asarray(neg), metric=self._metric(), k=k, weight=weight,
        )
        return fetch_np(d2, i2)

    def _merge_overflow(self, q, dist, idx, keep, k, overflow):
        """Exactly score the overflow rows (rows whose cluster block was
        full) and merge — bounded-size brute force, classic IVF spill.
        ``overflow`` is the sorted slot list snapshotted at dispatch time.

        The scoring runs on device (``_overflow_topk``: rows gather from
        the store's device copy, only [B, k] winners download) with both
        operand dims padded to powers of two, so the program is one of
        ~log2 shapes instead of recompiling for every (B, overflow-count)
        pair the serving mix produces. Overflow slots are by construction
        absent from the block layout, so the merge needs no dedup."""
        slots = np.asarray(overflow, np.int64)
        keep_np = np.asarray(keep)
        slots = slots[keep_np[slots]]
        if not len(slots):
            return dist, idx
        B, O = q.shape[0], len(slots)
        W = dist.shape[1]
        Bp, Op = _pow2(B), _pow2(O)
        q_pad = q if Bp == B else np.concatenate(
            [q, np.broadcast_to(q[:1], (Bp - B, q.shape[1]))]
        )
        slots_pad = np.full(Op, -1, np.int64)
        slots_pad[:O] = slots
        vectors, norms = self._gather_source()
        d_o, i_o = fetch_np(*_overflow_topk(
            jnp.asarray(q_pad), jnp.asarray(slots_pad),
            vectors, norms, metric=self._metric(), k=W,
        ))
        cd = np.concatenate([dist, d_o[:B]], axis=1)
        ci = np.concatenate([idx, i_o[:B].astype(idx.dtype)], axis=1)
        order = np.argsort(cd, axis=1, kind="stable")[:, :W]
        return (
            np.take_along_axis(cd, order, axis=1),
            np.take_along_axis(ci, order, axis=1),
        )

    # ----------------------------------------------------------- tunables

    def get_optimization_parameters(self) -> dict:
        return {
            "n_probe": self.config.n_probe,
            "n_clusters": self.n_clusters,
            "kmeans_iters": self.config.kmeans_iters,
        }

    def set_optimization_parameters(self, **params) -> None:
        if "n_probe" in params:
            p = int(params["n_probe"])
            if p <= 0:
                raise ValueError("n_probe must be positive")
            self.config.n_probe = p
        unknown = set(params) - {"n_probe"}
        if unknown:
            raise ValueError(f"immutable or unknown parameters: {sorted(unknown)}")

    def get_detailed_metrics(self) -> dict:
        with self._lock:
            inflight = (
                self._maint_thread is not None
                and self._maint_thread.is_alive()
            )
            return {
                "size": self.size,
                "built": self._built,
                "n_clusters": self.n_clusters,
                "overflow": len(self._overflow),
                "drift_overflow": len(self._drift),
                "churn_since_build": self._churn,
                "retrains": self._n_retrains,
                "refreshes": self._n_refreshes,
                "last_retrain_s": round(self._last_rebuild_s, 3),
                "tuned_n_probe": self._tuned_n_probe,
                "tuned_recall": (
                    None if self._tuned_recall is None
                    else round(self._tuned_recall, 4)
                ),
                "tuned_recall_stderr": (
                    None if self._tuned_stderr is None
                    else round(self._tuned_stderr, 4)
                ),
                "maintenance": {
                    "inflight": inflight,
                    "pending": self._maint_pending,
                    "swaps": self._maint_swaps,
                    "last_swap_stall_s": round(self._maint_last_stall_s, 4),
                    "error": self._maint_error,
                },
                "device_bytes": self.device_bytes(),
                "config": self.get_optimization_parameters(),
            }

    def device_bytes(self) -> dict:
        """HBM footprint: the engine's own buffers (blocks/centroids/
        masks, excluding the shared store) and the store's synced view —
        bytes/vector per engine is the bench matrix's memory axis
        (VERDICT r3 next #3)."""
        from quiver_tpu.core.store import VectorStore
        from quiver_tpu.utils.memory import device_bytes, store_device_bytes

        own = device_bytes(self, skip=(VectorStore,))
        st = store_device_bytes(self.store)
        n = max(self.size, 1)
        return {
            "engine": own,
            "store": st,
            "total": own + st,
            "per_vector": round((own + st) / n, 1),
        }

    # ---------------------------------------------------------- persistence

    def export_topology(self) -> Optional[dict]:
        """Sidecar: centroids + assignment (slot-addressed), so load skips
        k-means retraining (block layout is rebuilt deterministically)."""
        with self._lock:
            if not self._built:
                return None
            assign = np.full(self.store.capacity, -1, np.int64)
            live = self._slot_pos[:, 0] >= 0
            assign[live] = self._slot_pos[live, 0]
            return {
                "format_version": np.int64(1),
                "kind": np.bytes_(b"ivf"),
                "centroids": self._centroids.copy(),
                "assign": assign,
                "cmax": np.int64(self._cmax),
            }

    def import_topology(self, data: dict, slot_remap: np.ndarray) -> None:
        kind = data.get("kind")
        if kind is not None and bytes(kind) != b"ivf":
            return
        with self._lock:
            cents = np.asarray(data["centroids"], np.float32)
            K = len(cents)
            old_assign = np.asarray(data["assign"], np.int64)
            assign = np.full(self.store.capacity, -1, np.int64)
            old_slots = np.flatnonzero(old_assign >= 0)
            new_slots = slot_remap[old_slots]
            ok = new_slots >= 0
            assign[new_slots[ok]] = old_assign[old_slots[ok]]
            # rows the sidecar doesn't know (WAL adds) assign to their
            # centroid (reserved cluster ids masked out via _assign_scores)
            self._centroids = cents
            self._cent_dev = self._put_cent_dev(cents)
            valid = self.store._np_valid
            unknown = np.flatnonzero(valid & (assign < 0))
            if len(unknown):
                assign[unknown] = self._assign_nearest(
                    self.store._np_vectors[unknown]
                )
            cmax = data.get("cmax")
            self._layout_from_assign(
                assign, K, cmax=None if cmax is None else int(cmax)
            )

    def _layout_from_assign(
        self, assign: np.ndarray, K: int, cmax: Optional[int] = None
    ) -> None:
        c = self.config
        vectors = self.store._np_vectors
        n_live = int((assign >= 0).sum())
        if n_live == 0:
            self._built = False
            return
        if cmax is None:  # pre-split sidecars: derive from K (may spill)
            cmax = _cmax_shape(c.cmax_factor * max(n_live, 1) / K)
        counts = np.bincount(assign[assign >= 0], minlength=K)
        if counts.max(initial=0) > cmax:

            def scores_fn(rows):
                return self._assign_scores(vectors[rows])

            assign = balance_assignment(assign, scores_fn, cmax, K)
        block_slot = np.full((K, cmax), -1, np.int32)
        slot_pos = np.full((self.store.capacity, 2), -1, np.int64)
        order = np.argsort(assign, kind="stable")
        order = order[assign[order] >= 0]
        sorted_c = assign[order]
        fill = np.bincount(sorted_c, minlength=K).astype(np.int64)
        first = np.concatenate([[0], np.cumsum(fill)[:-1]])
        pos_in = np.arange(len(order)) - first[sorted_c]
        block_slot[sorted_c, pos_in] = order
        slot_pos[order, 0] = sorted_c
        slot_pos[order, 1] = pos_in
        # blocks hold RESIDUALS v - c_k: the bf16 probe matmul then only
        # carries cluster-radius magnitudes; the f32 per-(query, cluster)
        # constants restore exactness (ops/ivf_kernels.ivf_query docstring)
        if self._layout_on_device:
            # gather rows from the store's DEVICE copy: only the [K, cmax]
            # slot map uploads; the block tensor never exists on host
            vectors_dev, ns_dev = self._gather_source()
            if self._pace_s:
                # paced (staging): short chunk programs + yields, so
                # concurrent serving queries interleave with the layout
                kc = max(1, min(K, (1 << 18) // max(cmax, 1)))
                (
                    self._blocks_t, self._block_ns, self._block_inv,
                    self._block_slot, self._block_keep, rsum,
                ) = _layout_dev_paced(
                    jnp.asarray(block_slot), vectors_dev, ns_dev,
                    jnp.asarray(self._centroids),
                    kc=kc, cdtype=self.compute_dtype, pace=self._pace,
                )
            else:
                kc = max(1, min(K, (1 << 21) // max(cmax, 1)))
                (
                    self._blocks_t, self._block_ns, self._block_inv,
                    self._block_slot, self._block_keep, rsum,
                ) = _layout_dev(
                    jnp.asarray(block_slot), vectors_dev, ns_dev,
                    jnp.asarray(self._centroids),
                    kc=kc, cdtype=self.compute_dtype,
                )
            # drift baseline for refresh(): mean squared residual over live
            # rows (unoccupied positions contribute zero to the sum)
            self._built_resid = float(np.asarray(rsum)) / max(n_live, 1)
        else:
            blocks = np.zeros((K, cmax, self.store.dim), np.float32)
            placed = vectors[order]
            blocks[sorted_c, pos_in] = placed - self._centroids[sorted_c]
            rns = np.sum(
                blocks.astype(np.float64) ** 2, axis=2
            ).astype(np.float32)
            self._built_resid = float(rns.sum() / max(n_live, 1))
            full_ns = np.zeros((K, cmax), np.float64)
            full_ns[sorted_c, pos_in] = np.sum(
                placed.astype(np.float64) ** 2, axis=1
            )
            inv = np.where(
                full_ns > 0, 1.0 / np.sqrt(np.maximum(full_ns, 1e-30)), 0.0
            ).astype(np.float32)
            (
                self._blocks_t, self._block_slot, self._block_ns,
                self._block_inv, self._block_keep,
            ) = self._put_block_arrays(
                np.ascontiguousarray(
                    blocks.transpose(0, 2, 1).astype(self._np_compute_dtype())
                ),
                block_slot, rns, inv, block_slot >= 0,
            )
        self._keep_pending = []
        self._fill = fill
        self._slot_pos = slot_pos
        self._overflow = set()
        self._drift = set()
        self._built = True
        self._built_size = n_live
        self._churn = 0
        self._cmax = int(cmax)
        self._layout_gen += 1
