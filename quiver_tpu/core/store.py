"""Columnar vector store — one HBM-resident matrix per collection.

The reference keeps up to four copies of every vector (exact map, HNSW node,
hybrid map, Collection.Vectors — reference: pkg/hybrid/hybrid_index.go:15-43,
pkg/core/collection.go:98-117, see SURVEY.md §3.2). Here a collection owns
exactly one store: a host-authoritative numpy mirror (for persistence and
growth) plus a lazily-synced device view — ``vectors f32[cap, d]`` padded to a
{2^k, 3*2^(k-1)} ladder capacity with a ``valid`` occupancy mask (deletes are cleared
bits, the analogue of the reference's tombstones, pkg/hnsw/hnsw.go:741-842),
and precomputed row stats so cosine/L2 scans skip the norm pass.

Mutations accumulate as pending slot updates and are applied to the device
arrays with one scatter per sync; capacity growth doubles and re-uploads.
"""

from __future__ import annotations

import copy
import threading
from dataclasses import dataclass
from typing import Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from quiver_tpu.ops.distance import inv_norms, norms_sq
from quiver_tpu.types import DistanceType, VectorRecord

_MIN_CAPACITY = 1024


def _next_pow2(n: int) -> int:
    c = _MIN_CAPACITY
    while c < n:
        c *= 2
    return c


def _next_cap(n: int) -> int:
    """Capacity ladder {2^k, 3*2^(k-1)}: static shapes for XLA (at most
    ~2x the compiled program families of a pure pow2 ladder) with padding
    waste capped at 25% instead of 100% — at 10M x 128-d f32 the pure
    pow2 ladder padded to 16.78M rows, 3.2 GiB of dead HBM that directly
    lowered max-N-per-chip (measured in benches/bench_10m.py's device
    audit)."""
    p = _next_pow2(n)
    three_q = 3 * (p // 4)
    return three_q if three_q >= n else p


@dataclass(frozen=True)
class StoreDeviceView:
    """Immutable device-side snapshot used by search kernels."""

    vectors: jax.Array  # f32[cap, d]
    valid: jax.Array  # bool[cap]
    norms_sq: jax.Array  # f32[cap]
    inv_norms: jax.Array  # f32[cap]
    capacity: int
    generation: int  # bumps on every sync; kernels key caches off this


@jax.jit
def _scatter_rows(vectors, valid, norms, invs, slots, new_vecs, new_valid):
    vectors = vectors.at[slots].set(new_vecs, mode="drop")
    valid = valid.at[slots].set(new_valid, mode="drop")
    # update norms only for the scattered rows: a full norms_sq pass here
    # re-read the entire [cap, d] matrix per sync — hundreds of MB of HBM
    # traffic for an 8-row write at 1M x 128 (the sharded scatter,
    # parallel/sharded.py, always did the cheap per-row form)
    row_ns = norms_sq(new_vecs)
    norms = norms.at[slots].set(row_ns, mode="drop")
    invs = invs.at[slots].set(inv_norms(row_ns), mode="drop")
    return vectors, valid, norms, invs


class VectorStore:
    """Slot-addressed columnar vector + metadata store.

    Thread-safety: a single re-entrant writer lock guards mutations; reads of
    the device view are lock-free once synced (functional arrays can't race —
    SURVEY.md §5.2).
    """

    def __init__(self, dim: int, metric: DistanceType | str = DistanceType.COSINE,
                 capacity: int = _MIN_CAPACITY):
        if dim <= 0:
            raise ValueError(f"dimension must be positive, got {dim}")
        self.dim = int(dim)
        self.metric = DistanceType.parse(metric)
        self._lock = threading.RLock()
        cap = _next_cap(capacity)
        self._np_vectors = np.zeros((cap, dim), dtype=np.float32)
        self._np_valid = np.zeros((cap,), dtype=bool)
        self._ids: list[Optional[str]] = [None] * cap
        self._metadata: list[Optional[dict]] = [None] * cap
        self._id_to_slot: dict[str, int] = {}
        self._free: list[int] = []
        self._high_water = 0  # first never-used slot
        self._count = 0
        # device sync state
        self._device: Optional[StoreDeviceView] = None
        self._pending_slots: list[int] = []
        self._full_resync = True
        self._generation = 0
        # change feed for external device-state consumers (sharded engines):
        # slot-level mutation log + an epoch that bumps whenever incremental
        # replay is impossible (growth, log overflow) — consumers then do a
        # full resync instead of a scatter
        self._change_epoch = 0
        self._change_log: list[int] = []

    # ------------------------------------------------------------------ host

    @property
    def size(self) -> int:
        return self._count

    @property
    def capacity(self) -> int:
        return self._np_vectors.shape[0]

    def __contains__(self, vec_id: str) -> bool:
        return vec_id in self._id_to_slot

    def slot_of(self, vec_id: str) -> int:
        return self._id_to_slot[vec_id]

    def id_of(self, slot: int) -> Optional[str]:
        if 0 <= slot < len(self._ids):
            return self._ids[slot]
        return None

    def get(self, vec_id: str) -> VectorRecord:
        with self._lock:
            slot = self._id_to_slot.get(vec_id)
            if slot is None:
                raise KeyError(f"vector not found: {vec_id}")
            md = self._metadata[slot]
            return VectorRecord(
                id=vec_id,
                values=self._np_vectors[slot].copy(),
                metadata=copy.deepcopy(md) if md is not None else None,
            )

    def ids(self) -> list[str]:
        return list(self._id_to_slot.keys())

    def _alloc_slots(self, n: int) -> np.ndarray:
        slots = []
        while self._free and len(slots) < n:
            slots.append(self._free.pop())
        remaining = n - len(slots)
        if remaining:
            needed = self._high_water + remaining
            if needed > self.capacity:
                self._grow(needed)
            slots.extend(range(self._high_water, self._high_water + remaining))
            self._high_water += remaining
        return np.asarray(slots, dtype=np.int64)

    def _grow(self, needed: int) -> None:
        new_cap = _next_cap(needed)
        old_cap = self.capacity
        grown = np.zeros((new_cap, self.dim), dtype=np.float32)
        grown[:old_cap] = self._np_vectors
        self._np_vectors = grown
        self._np_valid = np.concatenate(
            [self._np_valid, np.zeros(new_cap - old_cap, dtype=bool)]
        )
        self._ids.extend([None] * (new_cap - old_cap))
        self._metadata.extend([None] * (new_cap - old_cap))
        self._full_resync = True
        self._change_epoch += 1
        self._change_log.clear()

    def add_batch(
        self,
        ids: Sequence[str],
        vectors,
        metadata: Optional[Sequence[Optional[dict]]] = None,
    ) -> np.ndarray:
        """Insert a batch; returns assigned slots. All-or-nothing validation."""
        vecs = np.asarray(vectors, dtype=np.float32)
        if vecs.ndim == 1:
            vecs = vecs[None, :]
        if vecs.shape != (len(ids), self.dim):
            raise ValueError(
                f"vector batch shape {vecs.shape} != ({len(ids)}, {self.dim})"
            )
        if metadata is None:
            metadata = [None] * len(ids)
        if len(metadata) != len(ids):
            raise ValueError("metadata length mismatch")
        with self._lock:
            seen = set()
            for vid in ids:
                if not vid:
                    raise ValueError("vector ID must not be empty")
                if vid in self._id_to_slot or vid in seen:
                    raise ValueError(f"vector with ID {vid} already exists")
                seen.add(vid)
            slots = self._alloc_slots(len(ids))
            self._np_vectors[slots] = vecs
            self._np_valid[slots] = True
            for s, vid, md in zip(slots, ids, metadata):
                self._ids[s] = vid
                # deep copy: stored metadata must not alias the caller's
                # dict in either direction (the reference serializes
                # metadata to JSON, which copies both ways — pkg/
                # persistence/collection_test.go:613-682's contract)
                self._metadata[s] = copy.deepcopy(md) if md is not None else None
                self._id_to_slot[vid] = int(s)
            self._count += len(ids)
            self._pending_slots.extend(int(s) for s in slots)
            self._log_changes(slots)
            return slots

    def add(self, vec_id: str, vector, metadata: Optional[dict] = None) -> int:
        return int(self.add_batch([vec_id], [vector], [metadata])[0])

    def update_batch(
        self,
        ids: Sequence[str],
        vectors=None,
        metadata: Optional[Sequence[Optional[dict]]] = None,
    ) -> None:
        """In-place update (reference Update = delete+reinsert,
        pkg/core/collection.go:417-466; slot stability lets us do better)."""
        with self._lock:
            slots = []
            for vid in ids:
                if vid not in self._id_to_slot:
                    raise KeyError(f"vector not found: {vid}")
                slots.append(self._id_to_slot[vid])
            if vectors is not None:
                vecs = np.asarray(vectors, dtype=np.float32)
                if vecs.ndim == 1:
                    vecs = vecs[None, :]
                if vecs.shape != (len(ids), self.dim):
                    raise ValueError("update vector shape mismatch")
                self._np_vectors[slots] = vecs
                self._pending_slots.extend(slots)
                self._log_changes(slots)
            if metadata is not None:
                for s, md in zip(slots, metadata):
                    self._metadata[s] = copy.deepcopy(md) if md is not None else None

    def delete(self, vec_id: str) -> bool:
        return self.delete_batch([vec_id]) == 1

    def delete_batch(self, ids: Iterable[str]) -> int:
        with self._lock:
            removed = 0
            for vid in ids:
                slot = self._id_to_slot.pop(vid, None)
                if slot is None:
                    continue
                self._np_valid[slot] = False
                self._np_vectors[slot] = 0.0
                self._ids[slot] = None
                self._metadata[slot] = None
                self._free.append(slot)
                self._pending_slots.append(slot)
                self._change_log.append(int(slot))
                removed += 1
            self._count -= removed
            self._trim_change_log()
            return removed

    def metadata_of_slot(self, slot: int) -> Optional[dict]:
        return self._metadata[slot]

    def vector_of_slot(self, slot: int) -> np.ndarray:
        return self._np_vectors[slot]

    def snapshot(self):
        """(ids, vectors f32[n,d], metadata) of live rows, slot-ordered —
        the persistence source of truth (SURVEY.md §5.4)."""
        with self._lock:
            live = np.flatnonzero(self._np_valid)
            ids = [self._ids[s] for s in live]
            mds = [self._metadata[s] for s in live]
            return ids, self._np_vectors[live].copy(), mds

    def live_slots(self) -> np.ndarray:
        """Slots of live rows in snapshot order (topology sidecar remap)."""
        with self._lock:
            return np.flatnonzero(self._np_valid)

    # ----------------------------------------------------------- change feed

    def _log_changes(self, slots) -> None:
        self._change_log.extend(int(s) for s in slots)
        self._trim_change_log()

    def _trim_change_log(self) -> None:
        # replaying more scatter rows than the capacity is worse than a full
        # resync — overflow bumps the epoch so lagging consumers resync
        if len(self._change_log) > self.capacity:
            self._change_epoch += 1
            self._change_log.clear()

    def changes_since(self, cursor):
        """Incremental change feed for external device-state consumers.

        ``cursor`` is an opaque token from a previous call (or None). Returns
        ``(new_cursor, slots)`` where ``slots`` is a unique np.int64 array of
        mutated slots since the cursor — or ``None`` when incremental replay
        is impossible (first call, capacity growth, or log overflow) and the
        consumer must resync its full view.
        """
        with self._lock:
            new_cursor = (self._change_epoch, len(self._change_log))
            if cursor is None or cursor[0] != self._change_epoch:
                return new_cursor, None
            pos = cursor[1]
            slots = self._change_log[pos:]
            return new_cursor, np.unique(np.asarray(slots, np.int64))

    def read_rows(self, slots: np.ndarray):
        """(vectors f32[m, d], valid bool[m]) copies for the given slots —
        a consistent host read for incremental device scatters."""
        with self._lock:
            return self._np_vectors[slots].copy(), self._np_valid[slots].copy()

    # ---------------------------------------------------------------- device

    def device_view(self) -> StoreDeviceView:
        """Sync pending mutations to the device and return the view."""
        with self._lock:
            if self._device is None or self._full_resync:
                vecs = jnp.asarray(self._np_vectors)
                valid = jnp.asarray(self._np_valid)
                ns = norms_sq(vecs)
                self._generation += 1
                self._device = StoreDeviceView(
                    vecs, valid, ns, inv_norms(ns), self.capacity, self._generation
                )
                self._full_resync = False
                self._pending_slots.clear()
            elif self._pending_slots:
                slots = np.unique(np.asarray(self._pending_slots, dtype=np.int64))
                # pad the scatter to a pow2 row count: a fresh index shape
                # per call is a fresh XLA program (~seconds of remote
                # compile each on a tunnel link); OOB pad rows drop
                m = _next_pow2(max(len(slots), 8))
                pslots = np.full(m, self.capacity, np.int64)
                pslots[: len(slots)] = slots
                safe = np.minimum(pslots, self.capacity - 1)
                v, va, ns, inv = _scatter_rows(
                    self._device.vectors,
                    self._device.valid,
                    self._device.norms_sq,
                    self._device.inv_norms,
                    jnp.asarray(pslots),
                    jnp.asarray(self._np_vectors[safe]),
                    jnp.asarray(self._np_valid[safe]),
                )
                self._generation += 1
                self._device = StoreDeviceView(
                    v, va, ns, inv, self.capacity, self._generation
                )
                self._pending_slots.clear()
            return self._device
