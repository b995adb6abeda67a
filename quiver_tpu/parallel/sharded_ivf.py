"""Multi-chip IVF: cluster-sharded block tensor + ICI top-k merge.

The IVF engine is the serving engine at scale (index/ivf.py), and its block
tensor ``[K, d, Cmax]`` shards naturally BY CLUSTER: each chip owns a
contiguous range of cluster ids, centroids replicate (they are tiny), and a
query batch runs SPMD under ``shard_map``:

1. every chip runs the SAME replicated probe stage (top-P clusters per
   query over the full centroid set, reserved/padded ids masked out);
2. each chip keeps only the (query, probe) pairs whose cluster IT owns,
   compressed to the front of a static-bound local pair list — so the
   ragged grouped matmul's row count actually SHRINKS with the mesh
   (``local_pair_factor``x the mean load absorbs cluster skew; overflow
   pairs beyond the bound drop, like the einsum path's q_cap);
3. the shared pair-candidate kernel (ops/ivf_kernels._pairs_candidates,
   truncated-pair form) scores the local pairs against the LOCAL block
   slice and reduces to per-shard finalists with score-derived distances —
   slots resolve against the local block_slot slice, so nothing
   slot-addressed ever gathers across chips;
4. one ``all_gather`` + re-top-k merges per-shard results over ICI — the
   same merge the sharded exact scan uses (parallel/sharded.py:102-110).

Cluster-id layout: after k-means + split, clusters renumber so shard ``s``
owns ids ``[s*KL, s*KL + owned_s)`` within its padded range of ``KL``
(``KL = max_s owned_s + 1``); the unowned tail ids are RESERVED — empty
blocks whose ``block_keep`` is all-False and whose centroid scores mask to
-inf in probe selection. The last reserved id of each shard doubles as the
sentinel group that absorbs local-pair padding, so the grouped matmul needs
no dynamic shapes anywhere.

Sharded serving is score-derived only (``rescore=False``): the exact
survivor re-rank would gather store rows by global slot across shards. The
bf16-residual noise this admits is measured far below the ranking gaps
(ops/ivf_kernels.ivf_query docstring), and the serving configuration runs
score-derived even single-chip.

The reference has no distributed layer at all (SURVEY.md §2.11); its only
batch parallelism is goroutine fan-out (pkg/hnsw/adapter.go:238-290). This
module is the TPU-native replacement for the flagship engine, completing
the sharded engine family (exact: parallel/sharded.py, graph:
parallel/sharded_graph.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quiver_tpu.core.store import VectorStore
from quiver_tpu.index.ivf import IVFConfig, IVFIndex, _pow2
from quiver_tpu.ops.ivf_kernels import (
    NEG_BIG,
    _pairs_candidates,
    probe_stage,
    scores_to_distances,
)
from quiver_tpu.ops.scan import MASKED_DIST
from quiver_tpu.parallel.sharded import (
    DATA_AXIS,
    ShardedExactIndex,
    make_mesh,
    sharded_negative_rerank,
)
from quiver_tpu.types import DistanceType


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "metric", "k", "n_probe", "m_pairs", "compute_dtype",
        "oversample", "probe_approx", "probe_sel_approx", "seg_width",
        "has_mask",
    ),
)
def sharded_ivf_query(
    q: jax.Array,  # f32[B, d] (replicated)
    centroids: jax.Array,  # f32[Kg, d] (replicated; Kg = n * KL padded)
    cent_norms_sq: jax.Array,  # f32[Kg] (replicated)
    cluster_live: jax.Array,  # bool[Kg] (replicated; False = reserved id)
    blocks_t: jax.Array,  # [Kg, d, Cmax] cluster-sharded residuals
    block_slot: jax.Array,  # i32[Kg, Cmax] cluster-sharded
    block_rns: jax.Array,  # f32[Kg, Cmax] cluster-sharded
    block_inv_norms: jax.Array,  # f32[Kg, Cmax] cluster-sharded
    block_keep: jax.Array,  # bool[Kg, Cmax] cluster-sharded
    slot_mask: jax.Array,  # bool[cap] (replicated; facet mask) or dummy
    *,
    mesh: Mesh,
    metric: str,
    k: int,
    n_probe: int,
    m_pairs: int,
    compute_dtype=jnp.bfloat16,
    oversample: int = 4,
    probe_approx: float | None = 0.98,
    probe_sel_approx: float | None = 0.99,
    seg_width: int | None = 32,
    has_mask: bool = False,
):
    """SPMD pruned search over the cluster-sharded mesh. Returns replicated
    ``(dist f32[B, k], slot i32[B, k], max_load i32[])`` — global store
    slots, -1 empty, score-derived distances (see module docstring);
    ``max_load`` is the mesh-max per-shard local pair count, for the
    engine's skew auto-raise (``max_load > m_pairs`` means pairs dropped
    on the hottest shard this batch)."""
    metric_p = DistanceType.parse(metric)
    Kg = centroids.shape[0]
    n = mesh.shape[DATA_AXIS]
    if Kg % n != 0:
        raise ValueError(f"padded cluster count {Kg} not divisible by {n}")
    KL = Kg // n
    Cmax = blocks_t.shape[2]
    B, d = q.shape
    P_ = min(n_probe, Kg)
    BP = B * P_
    M = min(m_pairs, BP)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(),
            P(DATA_AXIS, None, None), P(DATA_AXIS, None), P(DATA_AXIS, None),
            P(DATA_AXIS, None), P(DATA_AXIS, None), P(),
        ),
        out_specs=(P(), P(), P()),
        # outputs are replicated by construction (identical post-all_gather
        # reduction on every chip); VMA inference can't see that
        check_vma=False,
    )
    def spmd(q, cents, cns, live, bt, bs, bns, binv, bk, smask):
        shard = jax.lax.axis_index(DATA_AXIS)
        lo = shard * KL

        # ---- replicated probe stage (reserved ids masked out)
        c_dots, c_aff, probe, caff = probe_stage(
            q, cents, cns, metric_p, P_, probe_sel_approx, cluster_live=live
        )

        # ---- local pair selection: keep pairs whose cluster this shard
        # owns, compressed to the front (static bound M). When a batch's
        # probes concentrate on one shard past M, the LOWEST-VALUE pairs
        # drop: selection prefers low probe rank (a query's rank-0 probe
        # carries most of its recall), then survivors re-sort by cluster
        # for the grouped matmul. The mesh-max local load is returned so
        # the engine can observe drops and auto-raise the bound
        # (ShardedIVFIndex._auto_raise_check).
        flat_c = probe.reshape(BP)
        is_local = (flat_c >= lo) & (flat_c < lo + KL)
        max_load = jax.lax.pmax(
            jnp.sum(is_local, dtype=jnp.int32), DATA_AXIS
        )
        rank = jax.lax.broadcasted_iota(jnp.int32, (B, P_), 1).reshape(BP)
        ord1 = jnp.argsort(
            jnp.where(is_local, rank, jnp.int32(P_)), stable=True
        ).astype(jnp.int32)[:M]
        kept_local = is_local[ord1]
        ord2 = jnp.argsort(
            jnp.where(kept_local, flat_c[ord1], jnp.int32(Kg))
        ).astype(jnp.int32)
        order = ord1[ord2]
        in_local = kept_local[ord2]
        # pad rows group under the shard's last (reserved) cluster id:
        # its block is empty (keep all-False), so they score NEG_BIG
        sorted_c = jnp.where(in_local, flat_c[order] - lo, KL - 1)
        b_of = (order // P_).astype(jnp.int32)

        bkeep = bk
        if has_mask:
            bkeep = bkeep & smask[jnp.maximum(bs, 0)]

        cents_local = jax.lax.dynamic_slice(cents, (lo, 0), (KL, d))
        best_s, best_flat = _pairs_candidates(
            q, cents_local, c_dots, caff, probe, order, sorted_c, b_of,
            bt, bns, binv, bkeep,
            metric=metric_p, k=k, compute_dtype=compute_dtype,
            oversample=oversample, probe_approx=probe_approx,
            seg_width=seg_width, cluster_offset=lo,
        )

        # ---- per-shard top-k with deferred local slot resolution
        n_sur = best_s.shape[1]
        kk = min(k, n_sur)
        top_s, posn = jax.lax.top_k(best_s, kk)
        oh = posn[:, :, None] == jnp.arange(n_sur, dtype=posn.dtype)[
            None, None, :]
        flat_k = jnp.sum(jnp.where(oh, best_flat[:, None, :], 0), axis=2)
        local_flat = jnp.clip(flat_k - lo * Cmax, 0, KL * Cmax - 1)
        slot = jnp.where(
            top_s > NEG_BIG / 2, bs.reshape(-1)[local_flat], -1
        )
        dist = scores_to_distances(top_s, q, metric_p)
        dist = jnp.where(slot >= 0, dist, MASKED_DIST)

        # ---- ICI merge: gather every shard's top-k, re-reduce
        all_d = jax.lax.all_gather(dist, DATA_AXIS, axis=0)  # [n, B, kk]
        all_i = jax.lax.all_gather(slot, DATA_AXIS, axis=0)
        all_d = jnp.transpose(all_d, (1, 0, 2)).reshape(B, n * kk)
        all_i = jnp.transpose(all_i, (1, 0, 2)).reshape(B, n * kk)
        neg_top, sel = jax.lax.top_k(-all_d, min(k, n * kk))
        out_d = -neg_top
        out_i = jnp.take_along_axis(all_i, sel, axis=1)
        out_i = jnp.where(out_d >= MASKED_DIST, -1, out_i)
        return out_d, out_i, max_load

    return spmd(
        q, centroids, cent_norms_sq, cluster_live,
        blocks_t, block_slot, block_rns, block_inv_norms, block_keep,
        slot_mask,
    )


class ShardedIVFIndex(IVFIndex):
    """IVF engine over a device mesh: cluster-sharded blocks, replicated
    centroids, per-shard candidate stage, one all_gather top-k merge.

    Same engine protocol and write semantics as :class:`IVFIndex` (the
    write path's block scatters carry replicated indices, so XLA applies
    them shard-locally). Exact fallbacks (unbuilt, per-query masks,
    manhattan, under-fill supplement) route through a
    :class:`ShardedExactIndex` over the same mesh, and negative rerank
    runs in-mesh (parallel/sharded.sharded_negative_rerank) — the corpus
    never materializes on one chip.
    """

    name = "sharded_ivf"
    #: host-side layout: block arrays are cluster-sharded over the mesh
    #: while the gather source is row-sharded (index/ivf.py _layout_dev
    #: would mix placements in one program)
    _layout_on_device = False

    def __init__(
        self,
        store: VectorStore,
        mesh: Optional[Mesh] = None,
        *,
        config: Optional[IVFConfig] = None,
        compute_dtype=jnp.bfloat16,
        local_pair_factor: float = 2.0,
        **cfg_overrides,
    ):
        if config is None:
            cfg_overrides.setdefault("rescore", False)
            config = IVFConfig(**cfg_overrides)
        if config.rescore:
            raise ValueError(
                "sharded IVF serves score-derived distances; the exact "
                "survivor re-rank would gather store rows across shards — "
                "set rescore=False"
            )
        super().__init__(store, config=config, compute_dtype=compute_dtype)
        self.mesh = mesh or make_mesh()
        self.n_shards = self.mesh.shape[DATA_AXIS]
        self.local_pair_factor = float(local_pair_factor)
        # exact fallbacks + under-fill + unbuilt path share the mesh
        self._exact = ShardedExactIndex(store, self.mesh)
        self._k_local = None  # padded per-shard cluster range KL
        # skew auto-raise state: (device max_load, M, mean) of the last
        # dispatched batch, checked lazily before the next one
        self._pending_load = None
        self._overflow_raises = 0

    #: background-maintenance clones also need the cluster-ownership
    #: geometry (refresh keeps the id space; index/ivf.py _make_staging)
    _CLONE_EXTRA = ("_k_local",)

    def _clone_for_maintenance(self) -> "ShardedIVFIndex":
        eng = ShardedIVFIndex(
            self.store, self.mesh, config=self.config,
            compute_dtype=self.compute_dtype,
            local_pair_factor=self.local_pair_factor,
        )
        # share the mesh-sharded corpus copy (internally locked) instead of
        # paying a second full-corpus device_put per maintenance job
        eng._exact = self._exact
        return eng

    # ------------------------------------------------------------- layout

    def _prepare_clusters(self, cents, assign):
        """Renumber clusters so shard ``s`` owns the contiguous id range
        ``[s*KL, s*KL + owned_s)`` (KL = max owned + 1; the unowned tail
        ids are reserved empty clusters). Assignment balances total ROWS
        per shard greedily (cluster sizes vary up to Cmax), so block HBM
        and matmul load spread evenly."""
        n = self.n_shards
        K = len(cents)
        counts = np.bincount(assign[assign >= 0], minlength=K)
        # greedy bin packing: biggest cluster to the lightest shard
        shard_of = np.zeros(K, np.int64)
        load = np.zeros(n, np.int64)
        members: list[list[int]] = [[] for _ in range(n)]
        for c in np.argsort(-counts):
            s = int(np.argmin(load))
            shard_of[c] = s
            load[s] += counts[c]
            members[s].append(int(c))
        owned_max = max(len(m) for m in members)
        KL = owned_max + 1  # >= 1 reserved id per shard (pad sentinel)
        Kg = n * KL
        remap = np.full(K, -1, np.int64)
        for s, m in enumerate(members):
            for j, c in enumerate(m):
                remap[c] = s * KL + j
        new_cents = np.zeros((Kg, len(cents[0])), np.float32)
        live = np.zeros(Kg, bool)
        new_cents[remap] = np.asarray(cents, np.float32)
        live[remap] = True
        new_assign = np.where(assign >= 0, remap[assign], -1)
        self._cluster_live = live
        self._k_local = KL
        return new_cents, new_assign

    def _put_cent_dev(self, cents: np.ndarray):
        rep = NamedSharding(self.mesh, P())
        cent_j = jax.device_put(cents.astype(np.float32), rep)
        ns = jax.device_put(
            np.sum(cents.astype(np.float64) ** 2, axis=1).astype(np.float32),
            rep,
        )
        return cent_j, ns

    def _put_block_arrays(self, blocks_t, block_slot, rns, inv, keep):
        m3 = NamedSharding(self.mesh, P(DATA_AXIS, None, None))
        m2 = NamedSharding(self.mesh, P(DATA_AXIS, None))
        return (
            jax.device_put(blocks_t, m3),
            jax.device_put(block_slot, m2),
            jax.device_put(rns, m2),
            jax.device_put(inv, m2),
            jax.device_put(keep, m2),
        )

    # -------------------------------------------------------------- query

    def _m_pairs(self, B: int, P_: int) -> int:
        """Static local-pair bound: ``local_pair_factor`` x the mean load
        BP/n, pow2-rounded (stable compiled shapes). Pairs beyond it drop
        (probabilistically — clusters hash ~uniformly across shards)."""
        mean = B * P_ / max(self.n_shards, 1)
        return min(
            B * P_, _pow2(max(64, int(np.ceil(self.local_pair_factor * mean))))
        )

    def _auto_raise_check(self):
        """Observe the previous batch's mesh-max pair load (fetched lazily,
        so the scalar read never syncs a batch that is still in flight) and
        raise ``local_pair_factor`` when the hottest shard overflowed its
        static bound: new factor covers the observed load with 1.5x
        headroom, capped at ``n_shards`` (at which M >= B*P — no drop is
        possible). The overflowed batch itself served degraded (lowest-rank
        pairs dropped); every later batch compiles at the raised bound.
        Recorded skew sweep: benches/bench_skew.py + docs/BENCH_RESULTS.md."""
        if self._pending_load is None:
            return
        load_dev, m_bound, mean = self._pending_load
        self._pending_load = None
        load = int(np.asarray(load_dev))
        if load <= m_bound or self.local_pair_factor >= self.n_shards:
            return
        self.local_pair_factor = float(
            min(max(1.5 * load / mean, self.local_pair_factor), self.n_shards)
        )
        self._overflow_raises += 1

    def search_slots_device(self, queries, k: int, *, mask=None):
        with self._lock:  # consistent layout vs concurrent maintenance swap
            if not self._built:
                raise RuntimeError("IVF index is not built")
            self._auto_raise_check()
            block_keep = self._keep_dev()
            cent_j, c_ns = self._cent_dev
            Kg = cent_j.shape[0]
            n_live = int(self._cluster_live.sum())
            P_ = min(self.config.n_probe, n_live)
            has_mask = mask is not None
            smask = (
                jnp.asarray(mask)
                if has_mask
                else jnp.zeros((8,), bool)  # dummy, replicated
            )
            m_pairs = self._m_pairs(queries.shape[0], P_)
            dist, slot, load = sharded_ivf_query(
                queries, cent_j, c_ns, jnp.asarray(self._cluster_live),
                self._blocks_t, self._block_slot, self._block_ns,
                self._block_inv, block_keep, smask,
                mesh=self.mesh, metric=self._metric(), k=k, n_probe=P_,
                m_pairs=m_pairs,
                compute_dtype=self.compute_dtype,
                oversample=self.config.oversample,
                probe_approx=self.config.probe_approx,
                probe_sel_approx=self.config.probe_sel_approx,
                seg_width=self.config.seg_width,
                has_mask=has_mask,
            )
            self._pending_load = (
                load, m_pairs, queries.shape[0] * P_ / max(self.n_shards, 1)
            )
            return dist, slot

    def _gather_source(self):
        """Write-path row source: the sharded exact engine's row-sharded
        corpus copy — mesh-committed, matching the sharded block arrays'
        placement (mixing the store's single-device view into the write
        programs would raise jit's incompatible-devices error)."""
        vectors, _valid, ns, _inv = self._exact._sharded_view()
        return vectors, ns

    def _rerank_negative(self, q, dist, idx, negative, weight, k):
        """In-mesh negative rerank over the exact engine's row-sharded
        corpus copy (the base class gathers store rows on one device)."""
        neg = np.asarray(negative, np.float32)
        if neg.ndim == 1:
            neg = np.broadcast_to(neg[None, :], q.shape)
        vectors, _, _, _ = self._exact._sharded_view()
        d2, i2 = sharded_negative_rerank(
            jnp.asarray(dist), jnp.asarray(idx), vectors, jnp.asarray(neg),
            mesh=self.mesh, metric=self._metric(), k=k, weight=weight,
        )
        from quiver_tpu.utils.transfer import fetch_np

        return fetch_np(d2, i2)

    def get_detailed_metrics(self) -> dict:
        m = super().get_detailed_metrics()
        m["sharded"] = {
            "n_shards": self.n_shards,
            "local_pair_factor": round(self.local_pair_factor, 3),
            "overflow_raises": self._overflow_raises,
        }
        return m

    # --------------------------------------------------------- persistence

    def export_topology(self) -> Optional[dict]:
        data = super().export_topology()
        if data is not None:
            data["cluster_live"] = self._cluster_live.copy()
            data["k_local"] = np.int64(self._k_local)
        return data

    def import_topology(self, data: dict, slot_remap: np.ndarray) -> None:
        live = data.get("cluster_live")
        kl = data.get("k_local")
        # the id space is only valid for the mesh shape it was exported
        # under: k_local * n_shards must cover it exactly, else per-shard
        # ranges (and the reserved pad sentinel at each range's end) land
        # on the wrong clusters and queries silently corrupt
        if (
            live is None
            or kl is None
            or int(kl) * self.n_shards != int(len(live))
        ):
            # sidecar from a different engine/mesh shape: renumber fresh
            # by rebuilding from the raw assignment through the base path
            # (which calls _prepare_clusters via build) — cheapest correct
            # fallback is a full rebuild
            self.build()
            return
        self._cluster_live = np.asarray(live, bool)
        self._k_local = int(kl)
        super().import_topology(data, slot_remap)
