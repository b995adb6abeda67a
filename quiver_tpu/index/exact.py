"""Exact (brute-force) index over a columnar store.

TPU-native replacement for the reference's ``ExactIndex`` map-walk + sort
(reference: pkg/hybrid/exact.go:14-133). Search is one jitted tiled-matmul
scan with fused masking and on-chip top-k (ops/scan.py); recall is 1.0 by
construction, so this index doubles as the oracle for every approximate
engine's tests (SURVEY.md §4 "exact-distance oracle").
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from quiver_tpu.core.store import VectorStore
from quiver_tpu.ops.scan import flat_scan_topk, negative_rerank
from quiver_tpu.types import DistanceType
from quiver_tpu.utils.transfer import fetch_np


def _pow2(n: int, lo: int = 8) -> int:
    c = lo
    while c < n:
        c *= 2
    return c


class ExactIndex:
    """Flat-scan index; shares the collection's VectorStore (no extra copy)."""

    name = "exact"

    def __init__(
        self,
        store: VectorStore,
        *,
        tile: int = 8192,
        compute_dtype=jnp.float32,
        approx_recall: float | None = None,
        precision: str | None = "auto",
    ):
        """approx_recall=None gives guaranteed-exact top-k (the oracle path);
        a float in (0, 1] switches to the TPU-native approx_max_k partial
        reduce at that recall target (~2x faster at corpus scale).

        precision="auto" resolves to "highest" (true-f32 MXU passes) on the
        oracle path — at DEFAULT precision the TPU runs f32 matmuls as one
        bf16 pass, which degraded "exact" ranking to 0.926 recall@10 on the
        heavy-tail corpus family (benches/bench_corpus_matrix.py,
        2026-08-20) — and to None (DEFAULT) when the caller opted into
        approximation (bf16 corpus or approx_recall)."""
        self.store = store
        self.tile = tile
        self.compute_dtype = compute_dtype
        self.approx_recall = approx_recall
        if precision == "auto":
            precision = (
                "highest"
                if compute_dtype == jnp.float32 and approx_recall is None
                else None
            )
        self.precision = precision
        # bf16-resident corpus cache for the fast path (halves the HBM read
        # vs casting f32 rows inside the kernel); keyed by store generation
        self._v16 = None
        self._v16_gen = -1

    def _corpus(self, view):
        if self.compute_dtype != jnp.bfloat16:
            return view.vectors
        if self._v16 is None or self._v16_gen != view.generation:
            self._v16 = view.vectors.astype(jnp.bfloat16)
            self._v16_gen = view.generation
        return self._v16

    @property
    def size(self) -> int:
        return self.store.size

    def search_slots(
        self,
        queries: np.ndarray,
        k: int,
        *,
        mask=None,
        negative: Optional[np.ndarray] = None,
        negative_weight: float = 0.5,
        exact: bool = False,  # engine-selection hint; this engine is exact
    ):
        """Batched top-k over slots.

        Args:
          queries: f32[B, d].
          k: result count (per query).
          mask: optional bool[cap] or bool[B, cap] device facet mask.
          negative: optional f32[B, d] negative examples; when present the
            scan over-retrieves max(2k, 30) and reranks by
            d_query - weight * d_negative (reference: pkg/hybrid/
            hybrid_index.go:516-570).

        Returns:
          (dist f32[B, k], slots i32[B, k]) numpy arrays; empty slots are -1.
        """
        view = self.store.device_view()
        q_np = np.asarray(queries, dtype=np.float32)
        if q_np.ndim == 1:
            q_np = q_np[None, :]
        # pad the batch to a power of two by repeating the first query so
        # every caller-supplied B shares one of ~log2(B) compiled programs
        # (mixed hybrid sub-batches and under-fill supplements otherwise
        # recompile the scan for every novel batch size)
        B0 = q_np.shape[0]
        Bp = _pow2(max(B0, 1))
        if Bp != B0:
            q_np = np.concatenate(
                [q_np, np.broadcast_to(q_np[:1], (Bp - B0, q_np.shape[1]))]
            )
        per_query_mask = mask is not None and np.asarray(mask).ndim == 2
        if per_query_mask and Bp != B0:
            m_np = np.asarray(mask, bool)
            mask = np.concatenate(
                [m_np, np.broadcast_to(m_np[:1], (Bp - B0, m_np.shape[1]))]
            )
        q = jnp.asarray(q_np)
        tile = min(self.tile, view.capacity)
        retrieve_k = k if negative is None else max(2 * k, 30)
        retrieve_k = min(retrieve_k, view.capacity)
        dist, idx = flat_scan_topk(
            q,
            self._corpus(view),
            view.valid,
            mask,
            view.norms_sq,
            view.inv_norms,
            metric=self.store.metric.value,
            k=retrieve_k,
            tile=tile,
            compute_dtype=self.compute_dtype,
            approx_recall=self.approx_recall,
            precision=self.precision,
        )
        if negative is not None:
            neg_np = np.asarray(negative, dtype=np.float32)
            if neg_np.ndim == 1:
                neg_np = np.broadcast_to(neg_np[None, :], (Bp, q_np.shape[1]))
            elif neg_np.shape[0] != Bp:
                neg_np = np.concatenate(
                    [neg_np,
                     np.broadcast_to(neg_np[:1], (Bp - B0, neg_np.shape[1]))]
                )
            dist, idx = negative_rerank(
                dist,
                idx,
                view.vectors,
                jnp.asarray(neg_np),
                metric=self.store.metric.value,
                k=min(k, retrieve_k),
                weight=negative_weight,
            )
        dist, idx = fetch_np(dist, idx)
        return dist[:B0], idx[:B0]

    def search(self, query, k: int, **kw):
        """Single-query convenience -> list[(id, distance)]."""
        dist, idx = self.search_slots(np.asarray(query, np.float32)[None, :], k, **kw)
        out = []
        for d, s in zip(dist[0], idx[0]):
            if s < 0:
                continue
            vid = self.store.id_of(int(s))
            if vid is not None:
                out.append((vid, float(d)))
        return out
