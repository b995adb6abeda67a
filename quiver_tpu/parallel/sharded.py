"""Multi-chip scale-out: corpus sharding + ICI top-k merge collectives.

The reference has NO distributed layer — its only parallelism is goroutine
fan-out over a mutex-guarded graph in one process (SURVEY.md §2.11, §5.8).
The TPU-native equivalent built here, per the survey's spec:

* the N x d vector matrix (and its masks/norms) shards row-wise across a 1-D
  ``data`` mesh axis via NamedSharding — each chip owns cap/n rows in HBM;
* a batched query runs SPMD under ``shard_map``: every chip scans its own
  shard with the SAME fused flat-scan/top-k kernel used single-chip, then the
  per-shard top-k merges over ICI with one ``all_gather`` + re-top-k — this
  replaces the reference's goroutine fan-out + Go sort merge
  (pkg/hnsw/adapter.go:238-290);
* multi-host (DCN tier) is the same program under
  ``jax.distributed.initialize`` — a deployment choice, not new code.

Tested on a virtual 8-device CPU mesh (tests/conftest.py) standing in for a
TPU slice; the driver's dryrun validates compile+execute the same way.
"""

from __future__ import annotations

import threading
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quiver_tpu.core.store import VectorStore
from quiver_tpu.ops.scan import MASKED_DIST, flat_scan_topk
from quiver_tpu.types import DistanceType
from quiver_tpu.utils.transfer import fetch_np

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D device mesh over the corpus-sharding axis."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis,))


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "metric", "k", "tile", "compute_dtype", "approx_recall",
        "precision",
    ),
)
def sharded_scan_topk(
    queries: jax.Array,  # f32[B, d] (replicated)
    vectors: jax.Array,  # f32[cap, d] sharded over rows
    valid: jax.Array,  # bool[cap]
    mask: jax.Array | None,  # bool[cap] or None
    v_norms_sq: jax.Array,
    v_inv_norms: jax.Array,
    *,
    mesh: Mesh,
    metric: str,
    k: int,
    tile: int = 8192,
    compute_dtype=jnp.float32,
    approx_recall: float | None = None,
    precision: str | None = None,
):
    """SPMD exact scan: per-shard fused top-k, then all_gather + re-top-k.

    Row indices returned are GLOBAL (shard offset added on-chip before the
    gather). Empty slots are id -1.
    """
    cap = vectors.shape[0]
    n = mesh.shape[DATA_AXIS]
    if cap % n != 0:
        raise ValueError(f"capacity {cap} not divisible by mesh size {n}")
    local_rows = cap // n
    local_tile = min(tile, local_rows)
    kk = min(k, local_rows)

    has_mask = mask is not None
    mask_spec = P(DATA_AXIS) if has_mask else P()
    mask_arg = mask if has_mask else jnp.zeros((n,), bool)  # dummy, sharded

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), mask_spec, P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
        # outputs are replicated by construction (same post-all_gather
        # reduction on every chip); VMA inference can't see that
        check_vma=False,
    )
    def spmd(q, v, va, m, ns, inv):
        shard = jax.lax.axis_index(DATA_AXIS)
        d_loc, i_loc = flat_scan_topk(
            q, v, va, m if has_mask else None, ns, inv,
            metric=metric, k=kk, tile=local_tile,
            compute_dtype=compute_dtype, approx_recall=approx_recall,
            precision=precision,
        )
        i_glob = jnp.where(i_loc >= 0, i_loc + shard * local_rows, -1)
        # ICI merge: gather every shard's top-k, re-reduce to global top-k
        all_d = jax.lax.all_gather(d_loc, DATA_AXIS, axis=0)  # [n, B, kk]
        all_i = jax.lax.all_gather(i_glob, DATA_AXIS, axis=0)
        B = q.shape[0]
        all_d = jnp.transpose(all_d, (1, 0, 2)).reshape(B, n * kk)
        all_i = jnp.transpose(all_i, (1, 0, 2)).reshape(B, n * kk)
        neg_top, sel = jax.lax.top_k(-all_d, min(k, n * kk))
        out_d = -neg_top
        out_i = jnp.take_along_axis(all_i, sel, axis=1)
        out_i = jnp.where(out_d >= MASKED_DIST, -1, out_i)
        return out_d, out_i

    return spmd(queries, vectors, valid, mask_arg, v_norms_sq, v_inv_norms)


@partial(jax.jit, static_argnames=("mesh", "metric", "k"))
def sharded_negative_rerank(
    cand_dist: jax.Array,  # f32[B, R] (replicated)
    cand_idx: jax.Array,  # i32[B, R] global slots, -1 empty (replicated)
    vectors: jax.Array,  # f32[cap, d] row-sharded
    negative: jax.Array,  # f32[B, d] (replicated)
    *,
    mesh: Mesh,
    metric: str,
    k: int,
    weight: float | jax.Array = 0.5,
):
    """Negative-example rerank without ever materializing the corpus on one
    device: each shard computes d(negative, candidate) for the candidate
    rows IT owns (a local gather), partial results combine with one psum,
    and the adjusted top-k reduces replicated. Same formula as
    ops.scan.negative_rerank (reference: pkg/hnsw/adapter.go:417-421)."""
    from quiver_tpu.ops.distance import distance_pairs

    cap = vectors.shape[0]
    n = mesh.shape[DATA_AXIS]
    local_rows = cap // n
    metric_p = DistanceType.parse(metric)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def spmd(cd, ci, v, neg):
        shard = jax.lax.axis_index(DATA_AXIS)
        B, R = ci.shape
        loc = ci - shard * local_rows
        mine = (ci >= 0) & (loc >= 0) & (loc < local_rows)
        rows = v[jnp.clip(loc, 0, local_rows - 1)].astype(jnp.float32)  # [B, R, d]
        negb = jnp.broadcast_to(neg.astype(jnp.float32)[:, None, :], rows.shape)
        d_neg = distance_pairs(
            rows.reshape(B * R, -1), negb.reshape(B * R, -1), metric_p
        ).reshape(B, R)
        d_neg = jax.lax.psum(jnp.where(mine, d_neg, 0.0), DATA_AXIS)
        adjusted = cd - jnp.asarray(weight, jnp.float32) * d_neg
        adjusted = jnp.where(ci >= 0, adjusted, MASKED_DIST)
        kk = min(k, R)
        neg_top, sel = jax.lax.top_k(-adjusted, kk)
        out_i = jnp.take_along_axis(ci, sel, axis=1)
        out_d = jnp.take_along_axis(cd, sel, axis=1)
        out_i = jnp.where(-neg_top >= MASKED_DIST, -1, out_i)
        out_d = jnp.where(out_i >= 0, out_d, MASKED_DIST)
        return out_d, out_i

    return spmd(cand_dist, cand_idx, vectors, negative)


def _sharded_scatter_fn(mesh: Mesh):
    """jit'd incremental row scatter that KEEPS the mesh sharding: updates
    and indices are replicated (small), the big arrays stay row-sharded."""
    row_sh = NamedSharding(mesh, P(DATA_AXIS))
    mat_sh = NamedSharding(mesh, P(DATA_AXIS, None))

    @partial(
        jax.jit,
        out_shardings=(mat_sh, row_sh, row_sh, row_sh),
        donate_argnums=(0, 1, 2, 3),
    )
    def scatter(vectors, valid, ns, inv, idx, rows, row_valid):
        vectors = vectors.at[idx].set(rows)
        valid = valid.at[idx].set(row_valid)
        row_ns = jnp.sum(rows.astype(jnp.float32) ** 2, axis=-1)
        ns = ns.at[idx].set(row_ns)
        inv = inv.at[idx].set(
            jnp.where(row_ns > 0, jax.lax.rsqrt(jnp.maximum(row_ns, 1e-30)), 0.0)
        )
        return vectors, valid, ns, inv

    return scatter


class ShardedExactIndex:
    """Engine-protocol adapter running the exact scan over a device mesh.

    Mirrors ExactIndex but shards the store's rows across ``mesh``;
    host-side API is unchanged, so a Collection can be pointed at a mesh by
    swapping engines. Writes sync INCREMENTALLY: the store's change feed
    drives a sharded scatter of just the mutated rows (a full re-upload only
    on first use, capacity growth, or feed overflow)."""

    name = "sharded_exact"

    def __init__(
        self,
        store: VectorStore,
        mesh: Optional[Mesh] = None,
        *,
        tile: int = 8192,
        compute_dtype=jnp.float32,
        approx_recall: float | None = None,
        precision: str | None = "auto",
    ):
        self.store = store
        self.mesh = mesh or make_mesh()
        self.tile = tile
        self.compute_dtype = compute_dtype
        self.approx_recall = approx_recall
        if precision == "auto":
            # same exact-contract resolution as index/exact.ExactIndex
            precision = (
                "highest"
                if compute_dtype == jnp.float32 and approx_recall is None
                else None
            )
        self.precision = precision
        self._cursor = None
        self._sharded = None
        self._scatter = _sharded_scatter_fn(self.mesh)
        # the view sync mutates (_cursor, _sharded); serving threads and a
        # background IVF maintenance job may both request it
        self._view_lock = threading.Lock()

    @property
    def size(self) -> int:
        return self.store.size

    def _full_resync(self):
        store = self.store
        n = self.mesh.shape[DATA_AXIS]
        if store.capacity % n != 0:
            raise ValueError(
                f"store capacity {store.capacity} not divisible by mesh size {n}"
            )
        vecs, valid = store.read_rows(np.arange(store.capacity))
        ns = np.sum(vecs.astype(np.float64) ** 2, axis=1).astype(np.float32)
        inv = np.where(ns > 0, 1.0 / np.sqrt(np.maximum(ns, 1e-30)), 0.0).astype(
            np.float32
        )
        row_sh = NamedSharding(self.mesh, P(DATA_AXIS))
        mat_sh = NamedSharding(self.mesh, P(DATA_AXIS, None))
        self._sharded = (
            jax.device_put(vecs, mat_sh),
            jax.device_put(valid, row_sh),
            jax.device_put(ns, row_sh),
            jax.device_put(inv, row_sh),
        )

    def _sharded_view(self):
        with self._view_lock:
            cursor, changed = self.store.changes_since(self._cursor)
            if self._sharded is None or changed is None:
                self._full_resync()
            elif len(changed):
                rows, row_valid = self.store.read_rows(changed)
                v, va, ns, inv = self._sharded
                self._sharded = self._scatter(
                    v, va, ns, inv,
                    jnp.asarray(changed), jnp.asarray(rows),
                    jnp.asarray(row_valid),
                )
            self._cursor = cursor
            return self._sharded

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
        vectors, valid, ns, inv = self._sharded_view()
        qd = jnp.asarray(q)
        retrieve_k = k if negative is None else max(2 * k, 30)
        retrieve_k = min(retrieve_k, self.store.capacity)
        mask_dev = None
        if mask is not None:
            if np.asarray(mask).ndim != 1:
                raise ValueError("sharded search supports corpus-wide masks only")
            mask_dev = jax.device_put(
                jnp.asarray(mask), NamedSharding(self.mesh, P(DATA_AXIS))
            )
        dist, idx = sharded_scan_topk(
            qd, vectors, valid, mask_dev, ns, inv,
            mesh=self.mesh, metric=self.store.metric.value, k=retrieve_k,
            tile=self.tile, compute_dtype=self.compute_dtype,
            approx_recall=self.approx_recall, precision=self.precision,
        )
        if negative is not None:
            neg = jnp.asarray(np.asarray(negative, np.float32))
            if neg.ndim == 1:
                neg = jnp.broadcast_to(neg[None, :], qd.shape)
            # rerank in-mesh: each shard scores the candidates it owns and
            # the partials psum — the corpus never gathers onto one device
            dist, idx = sharded_negative_rerank(
                dist, idx, vectors, neg,
                mesh=self.mesh, metric=self.store.metric.value,
                k=min(k, retrieve_k), weight=negative_weight,
            )
        dist, idx = fetch_np(dist, idx)
        return dist[:, :k], idx[:, :k]
